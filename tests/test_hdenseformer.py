"""HDenseFormer: shape smoke tests + forward parity vs reference weights."""
import numpy as np
import pytest

# torch must be imported before jax in the same process (OMP deadlock otherwise)
torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from hdenseformer_tpu.models.hdenseformer import HDenseFormer
from reference_util import reference_available, add_reference_to_path

needs_ref = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present"
)


def init_model(model, shape, seed=0):
    x = jnp.zeros(shape, jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(seed)}, x)
    return variables, x


def test_3d_shapes():
    model = HDenseFormer(
        in_channels=2, n_cls=2, n_filters=4, image_size=(32, 32, 32), transformer_depth=8
    )
    variables, x = init_model(model, (1, 32, 32, 32, 2))
    outs = model.apply(variables, x)
    assert [o.shape for o in outs] == [
        (1, 32, 32, 32, 2),
        (1, 16, 16, 16, 2),
        (1, 8, 8, 8, 2),
        (1, 4, 4, 4, 2),
    ]


def test_2d_shapes():
    model = HDenseFormer(
        in_channels=3, n_cls=2, n_filters=4, image_size=(64, 64), transformer_depth=8
    )
    variables, x = init_model(model, (2, 64, 64, 3))
    outs = model.apply(variables, x)
    assert [o.shape for o in outs] == [
        (2, 64, 64, 2),
        (2, 32, 32, 2),
        (2, 16, 16, 2),
        (2, 8, 8, 2),
    ]


def test_train_mode_dropout_runs():
    model = HDenseFormer(
        in_channels=1, n_cls=2, n_filters=2, image_size=(32, 32), transformer_depth=8
    )
    variables, x = init_model(model, (1, 32, 32, 1))
    outs = model.apply(
        variables, x, train=True, rngs={"dropout": jax.random.PRNGKey(1)}
    )
    assert np.isfinite(np.asarray(outs[0])).all()


# ---------------------------------------------------------------------------
# forward parity vs the reference torch implementation with copied weights
# ---------------------------------------------------------------------------

@needs_ref
def test_forward_parity_with_reference_weights():
    add_reference_to_path()
    import torch
    from models.HDenseFormer import HDenseFormer as RefHDF

    from hdf_mapping import map_hdenseformer_weights

    torch.manual_seed(0)
    in_ch, n_cls, nf, depth = 2, 2, 4, 8
    size = (32, 32, 32)
    ref = RefHDF(
        in_channels=in_ch, n_cls=n_cls, n_filters=nf, image_size=size,
        transformer_depth=depth,
    ).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    model = HDenseFormer(
        in_channels=in_ch, n_cls=n_cls, n_filters=nf, image_size=size,
        transformer_depth=depth,
    )
    variables, _ = init_model(model, (1,) + size + (in_ch,))
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    params = map_hdenseformer_weights(sd, params, in_ch, depth)

    rngx = np.random.RandomState(42)
    x = rngx.randn(1, in_ch, *size).astype(np.float32)
    with torch.no_grad():
        ref_outs = [o.numpy() for o in ref(torch.from_numpy(x))]

    x_cl = jnp.asarray(np.moveaxis(x, 1, -1))
    got_outs = model.apply({"params": params}, x_cl)
    for ref_o, got_o in zip(ref_outs, got_outs):
        got_nchw = np.moveaxis(np.asarray(got_o), -1, 1)
        np.testing.assert_allclose(got_nchw, ref_o, rtol=2e-3, atol=2e-4)


def test_remat_levels_mode_trains():
    """remat='levels' (checkpoint only the two big levels) runs fwd+bwd."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hdenseformer_tpu.models import get_net

    model = get_net(
        "HDenseFormer_32", channels=2, num_classes=2, input_shape=(16, 16, 16),
        transformer_depth=8, remat="levels",
    )
    x = jnp.zeros((1, 16, 16, 16, 2), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x)

    def loss_fn(p):
        outs = model.apply({"params": p}, x, train=True,
                           rngs={"dropout": jax.random.PRNGKey(1)})
        return sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in outs)

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    gnorm = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0


def test_s2d_off_matches_on_f32():
    """The packed execution path is numerically equivalent to fine-grid."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hdenseformer_tpu.models import get_net

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, 16, 16, 16, 2).astype(np.float32))
    outs = {}
    for s2d in (False, True):
        model = get_net(
            "HDenseFormer_32", channels=2, num_classes=2, input_shape=(16, 16, 16),
            transformer_depth=8, remat=False, s2d=s2d,
        )
        variables = model.init({"params": jax.random.PRNGKey(0)}, x)
        outs[s2d] = model.apply(variables, x, train=False)
    for a, b in zip(outs[False], outs[True]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_s2d_partial_rank_matches_fine_f32():
    """Auto-style spec {0: full, 1: last-dim partial} == fine-grid path."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hdenseformer_tpu.models import get_net

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, 16, 16, 16, 2).astype(np.float32))
    outs = {}
    for key, s2d in (("fine", False), ("partial", {0: True, 1: (2,)})):
        model = get_net(
            "HDenseFormer_32", channels=2, num_classes=2, input_shape=(16, 16, 16),
            transformer_depth=8, remat=False, s2d=s2d,
        )
        variables = model.init({"params": jax.random.PRNGKey(0)}, x)
        outs[key] = model.apply(variables, x, train=False)
    for a, b in zip(outs["fine"], outs["partial"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)

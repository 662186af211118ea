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

def _t2j_conv(w):
    # torch conv (out, in, *k) -> flax (*k, in, out)
    nd = w.ndim - 2
    return np.transpose(w, tuple(range(2, 2 + nd)) + (1, 0))


def _t2j_convT(w):
    # torch convtranspose (in, out, *k) -> equivalent-conv kernel (*k, in, out),
    # spatially flipped
    nd = w.ndim - 2
    w = np.transpose(w, tuple(range(2, 2 + nd)) + (0, 1))
    return np.flip(w, axis=tuple(range(nd))).copy()


@needs_ref
def test_forward_parity_with_reference_weights():
    add_reference_to_path()

    from models.HDenseFormer import HDenseFormer as RefHDF

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

    # ---- transformer paths: stack per-modality reference weights ---------
    attns = params["attns"]

    def stack(fn):
        return np.stack([fn(m) for m in range(in_ch)])

    attns["patch_embed"]["kernel"] = stack(
        lambda m: _t2j_conv(sd[f"attns.{m}.patch_embeddings.weight"])
    )
    attns["patch_embed"]["bias"] = stack(
        lambda m: sd[f"attns.{m}.patch_embeddings.bias"]
    )
    attns["pos_embed"] = stack(lambda m: sd[f"attns.{m}.position_embeddings"][0])
    n_blocks = depth // 4
    for i in range(n_blocks):
        blk = attns[f"block_{i}"]
        for j in range(4):
            base = f"blocks.{i}.0.layers.{j}"
            blk[f"squeeze_{j}"]["kernel"] = stack(
                lambda m: sd[f"attns.{m}.{base}.0.weight"].T
            )
            blk[f"squeeze_{j}"]["bias"] = stack(lambda m: sd[f"attns.{m}.{base}.0.bias"])
            blk[f"attn_norm_{j}"]["scale"] = stack(
                lambda m: sd[f"attns.{m}.{base}.1.norm.weight"]
            )
            blk[f"attn_norm_{j}"]["bias"] = stack(
                lambda m: sd[f"attns.{m}.{base}.1.norm.bias"]
            )
            blk[f"attn_{j}"]["to_qkv"]["kernel"] = stack(
                lambda m: sd[f"attns.{m}.{base}.1.fn.to_qkv.weight"].T
            )
            blk[f"attn_{j}"]["to_out"]["kernel"] = stack(
                lambda m: sd[f"attns.{m}.{base}.1.fn.to_out.0.weight"].T
            )
            blk[f"attn_{j}"]["to_out"]["bias"] = stack(
                lambda m: sd[f"attns.{m}.{base}.1.fn.to_out.0.bias"]
            )
            blk[f"ff_norm_{j}"]["scale"] = stack(
                lambda m: sd[f"attns.{m}.{base}.2.norm.weight"]
            )
            blk[f"ff_norm_{j}"]["bias"] = stack(
                lambda m: sd[f"attns.{m}.{base}.2.norm.bias"]
            )
            blk[f"ff_{j}"]["fc1"]["kernel"] = stack(
                lambda m: sd[f"attns.{m}.{base}.2.fn.net.0.weight"].T
            )
            blk[f"ff_{j}"]["fc1"]["bias"] = stack(
                lambda m: sd[f"attns.{m}.{base}.2.fn.net.0.bias"]
            )
            blk[f"ff_{j}"]["fc2"]["kernel"] = stack(
                lambda m: sd[f"attns.{m}.{base}.2.fn.net.3.weight"].T
            )
            blk[f"ff_{j}"]["fc2"]["bias"] = stack(
                lambda m: sd[f"attns.{m}.{base}.2.fn.net.3.bias"]
            )
        blk["out_layer"]["fc1"]["kernel"] = stack(
            lambda m: sd[f"attns.{m}.blocks.{i}.0.out_layer.net.0.weight"].T
        )
        blk["out_layer"]["fc1"]["bias"] = stack(
            lambda m: sd[f"attns.{m}.blocks.{i}.0.out_layer.net.0.bias"]
        )
        blk["out_layer"]["fc2"]["kernel"] = stack(
            lambda m: sd[f"attns.{m}.blocks.{i}.0.out_layer.net.3.weight"].T
        )
        blk["out_layer"]["fc2"]["bias"] = stack(
            lambda m: sd[f"attns.{m}.blocks.{i}.0.out_layer.net.3.bias"]
        )

    # ---- UpConv chains ---------------------------------------------------
    for ours, theirs in [
        ("deep_conv", "deep_conv"), ("up1", "up1"), ("up2", "up2"), ("up3", "up3"),
    ]:
        params[ours]["conv"]["kernel"] = _t2j_conv(sd[f"{theirs}.double_conv.0.weight"])
        params[ours]["conv"]["bias"] = sd[f"{theirs}.double_conv.0.bias"]

    # ---- UNet encoder/decoder blocks -------------------------------------
    for name in [
        "block_1_1_left", "block_1_2_left", "block_2_1_left", "block_2_2_left",
        "block_3_1_left", "block_3_2_left", "block_4_1_left", "block_4_2_left",
        "block_3_1_right", "block_3_2_right", "block_2_1_right", "block_2_2_right",
        "block_1_1_right", "block_1_2_right",
    ]:
        params[name]["conv"]["kernel"] = _t2j_conv(sd[f"{name}.conv.weight"])
        params[name]["norm"]["scale"] = sd[f"{name}.norm.weight"]
        params[name]["norm"]["bias"] = sd[f"{name}.norm.bias"]

    for k in (1, 2, 3):
        params[f"upconv_{k}"]["kernel"] = _t2j_convT(sd[f"upconv_{k}.weight"])
        params[f"upconv_{k}"]["bias"] = sd[f"upconv_{k}.bias"]

    for ours, theirs in [
        ("head", "conv1x1"), ("head_d1", "conv1x1_d1"),
        ("head_d2", "conv1x1_d2"), ("head_d3", "conv1x1_d3"),
    ]:
        params[ours]["kernel"] = _t2j_conv(sd[f"{theirs}.weight"])
        params[ours]["bias"] = sd[f"{theirs}.bias"]

    # ---- compare forward -------------------------------------------------
    rngx = np.random.RandomState(42)
    x = rngx.randn(1, in_ch, *size).astype(np.float32)
    with torch.no_grad():
        ref_outs = [o.numpy() for o in ref(torch.from_numpy(x))]

    x_cl = jnp.asarray(np.moveaxis(x, 1, -1))
    got_outs = model.apply({"params": params}, x_cl)
    for ref_o, got_o in zip(ref_outs, got_outs):
        got_nchw = np.moveaxis(np.asarray(got_o), -1, 1)
        np.testing.assert_allclose(got_nchw, ref_o, rtol=2e-3, atol=2e-4)

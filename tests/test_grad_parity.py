"""Full-model GRADIENT parity vs the reference: forward + loss + backward.

Validates the entire training-dynamics chain (conv / conv-transpose /
instance-norm / attention backward passes and the deep-supervision focal
loss) by comparing parameter gradients between the reference torch model
and our flax model with identical weights and input.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from hdf_mapping import map_hdenseformer_weights, t2j_conv, t2j_convT
from reference_util import reference_available, add_reference_to_path

needs_ref = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present"
)


@needs_ref
def test_hdenseformer_gradient_parity():
    add_reference_to_path()
    from models.HDenseFormer import HDenseFormer as RefHDF
    from loss.cross_entropy import FocalLoss as RefFocal
    from loss.combine_loss import DeepSuperloss as RefDS

    from hdenseformer_tpu.losses import get_loss
    from hdenseformer_tpu.models.hdenseformer import HDenseFormer

    torch.manual_seed(0)
    in_ch, n_cls, nf, depth = 2, 2, 4, 8
    size = (32, 32, 32)
    ref = RefHDF(in_channels=in_ch, n_cls=n_cls, n_filters=nf, image_size=size,
                 transformer_depth=depth).eval()  # eval: no dropout
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    model = HDenseFormer(in_channels=in_ch, n_cls=n_cls, n_filters=nf,
                         image_size=size, transformer_depth=depth)
    x = jnp.zeros((1,) + size + (in_ch,))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x)
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    params = map_hdenseformer_weights(sd, params, in_ch, depth)

    rng = np.random.RandomState(7)
    xin = rng.randn(1, in_ch, *size).astype(np.float32)
    lab = np.zeros((1, n_cls) + size, np.float32)
    lab[:, 1, 10:20, 10:20, 10:20] = 1
    lab[:, 0] = 1 - lab[:, 1]

    # --- torch backward ----------------------------------------------------
    crit_t = RefDS(criterion=RefFocal(reduction="sum"))
    xt = torch.from_numpy(xin)
    outs_t = ref(xt)
    loss_t = crit_t(outs_t, torch.from_numpy(lab))
    loss_t.backward()
    tgrads = {n: p.grad.detach().numpy() for n, p in ref.named_parameters()
              if p.grad is not None}

    # --- jax backward ------------------------------------------------------
    crit_j = get_loss("FocalLoss", use_ds=True)
    x_cl = jnp.asarray(np.moveaxis(xin, 1, -1))
    y_cl = jnp.asarray(np.moveaxis(lab, 1, -1))

    def loss_fn(p):
        outs = model.apply({"params": p}, x_cl)  # deterministic (no dropout)
        return crit_j(outs, y_cl)

    loss_j, jgrads = jax.value_and_grad(loss_fn)(
        jax.tree_util.tree_map(jnp.asarray, params)
    )
    assert float(loss_j) == pytest.approx(float(loss_t), rel=2e-3)

    # --- compare representative gradients across every layer type ----------
    checks = [
        # (torch name, torch->jax transform, jax path)
        ("conv1x1.weight", t2j_conv, ("head", "kernel")),
        ("conv1x1.bias", lambda w: w, ("head", "bias")),
        ("block_1_1_left.conv.weight", t2j_conv, ("block_1_1_left", "conv", "kernel")),
        ("block_1_1_left.norm.weight", lambda w: w, ("block_1_1_left", "norm", "scale")),
        ("block_3_2_right.conv.weight", t2j_conv, ("block_3_2_right", "conv", "kernel")),
        ("upconv_2.weight", t2j_convT, ("upconv_2", "kernel")),
        ("deep_conv.double_conv.0.weight", t2j_conv, ("deep_conv", "conv", "kernel")),
    ]
    for tname, tf, jpath in checks:
        ref_g = tf(tgrads[tname])
        got = jgrads
        for kpart in jpath:
            got = got[kpart]
        got = np.asarray(got)
        scale = max(np.abs(ref_g).max(), 1e-8)
        np.testing.assert_allclose(
            got / scale, ref_g / scale, rtol=0, atol=5e-3,
            err_msg=f"grad mismatch for {tname}",
        )

    # stacked per-modality transformer grads (qkv of the first layer)
    for m in range(in_ch):
        ref_g = tgrads[f"attns.{m}.blocks.0.0.layers.0.1.fn.to_qkv.weight"].T
        got = np.asarray(jgrads["attns"][f"block_0"]["attn_0"]["to_qkv"]["kernel"])[m]
        scale = max(np.abs(ref_g).max(), 1e-8)
        np.testing.assert_allclose(got / scale, ref_g / scale, rtol=0, atol=5e-3)

"""BatchNorm over s2d packed layouts (ops/fused_norm.py batch_pooled +
models/layers.py::BatchNorm(packed=True)).

Ground truth: the fine-grid math (flax nn.BatchNorm / plain autodiff of
torch-semantics BN — biased variance in the normalize, reference
models/DAUNet.py:49-63 uses torch BatchNorm3d). The packed module must
match the fine module's outputs, gradients, and running-stat updates so
a DAUNet level can switch layouts without changing the training
trajectory.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import linen as nn

from hdenseformer_tpu.models.layers import BatchNorm
from hdenseformer_tpu.ops.fused_norm import instance_norm_relu, pooled_stats
from hdenseformer_tpu.ops.s2d import (
    apply_shifted_mask,
    conv3_packed_p2s,
    conv3_packed_s2p,
    pack,
    unpack,
)

rng = np.random.default_rng(11)


def _ref_bn(x, scale, bias, eps, relu, parity):
    """Torch-semantics train-mode BN on the packed layout: stats per
    original channel over (batch, spatial, parity), biased variance."""
    n, fc = x.shape[0], x.shape[-1]
    c = fc // parity
    x32 = x.astype(jnp.float32)
    xr = x32.reshape((n,) + x.shape[1:-1] + (parity, c))
    raxes = (0,) + tuple(range(1, x.ndim - 1)) + (x.ndim - 1,)
    mean = jnp.mean(xr, axis=raxes)  # (C,)
    var = jnp.mean(jnp.square(xr), axis=raxes) - jnp.square(mean)
    mean_b = jnp.tile(mean, (parity,))
    var_b = jnp.tile(var, (parity,))
    y = (x32 - mean_b) * jax.lax.rsqrt(var_b + eps)
    if scale is not None:
        y = y * jnp.tile(scale, (parity,)) + jnp.tile(bias, (parity,))
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(x.dtype)


BP_CASES = [
    ((3, 6, 7, 16), True, True, 1),
    ((2, 4, 4, 4, 8 * 6), True, True, 8),
    ((2, 5, 5, 4 * 10), True, False, 4),
    ((2, 3, 3, 3, 8 * 4), False, True, 8),
]


@pytest.mark.parametrize("shape,affine,relu,parity", BP_CASES)
def test_batch_pooled_values_and_grads(shape, affine, relu, parity):
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    c = shape[-1] // parity
    scale = jnp.asarray(1 + 0.1 * rng.standard_normal(c), jnp.float32) if affine else None
    bias = jnp.asarray(0.1 * rng.standard_normal(c), jnp.float32) if affine else None
    got = instance_norm_relu(x, scale, bias, 1e-5, relu, parity, False, True)
    ref = _ref_bn(x, scale, bias, 1e-5, relu, parity)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    w = jnp.asarray(rng.standard_normal(shape), jnp.float32)

    def loss(fn, *args):
        return jnp.sum(w * fn(*args))

    if affine:
        g = jax.grad(
            lambda *a: loss(
                lambda x_, s_, b_: instance_norm_relu(
                    x_, s_, b_, 1e-5, relu, parity, False, True
                ), *a,
            ), argnums=(0, 1, 2),
        )(x, scale, bias)
        gr = jax.grad(
            lambda *a: loss(
                lambda x_, s_, b_: _ref_bn(x_, s_, b_, 1e-5, relu, parity), *a
            ), argnums=(0, 1, 2),
        )(x, scale, bias)
        for a, b_ in zip(g, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-4)
    else:
        g = jax.grad(
            lambda v: loss(
                lambda x_: instance_norm_relu(
                    x_, None, None, 1e-5, relu, parity, False, True
                ), v,
            )
        )(x)
        gr = jax.grad(
            lambda v: loss(lambda x_: _ref_bn(x_, None, None, 1e-5, relu, parity), v)
        )(x)
        np.testing.assert_allclose(np.asarray(g), np.asarray(gr), atol=2e-4)


class _FinePair(nn.Module):
    train: bool = True

    @nn.compact
    def __call__(self, x):
        y = BatchNorm(use_running_average=not self.train)(x)
        return nn.relu(y)


class _PackedPair(nn.Module):
    train: bool = True

    @nn.compact
    def __call__(self, xp):
        return BatchNorm(
            use_running_average=not self.train, packed=True, fuse_relu=True
        )(xp)


def test_packed_module_matches_fine_train_and_stats():
    x = jnp.asarray(rng.standard_normal((2, 6, 6, 6, 5)), jnp.float32)
    xp = pack(x)
    fine = _FinePair(train=True)
    packed = _PackedPair(train=True)
    vf = fine.init(jax.random.PRNGKey(0), x)
    vp = packed.init(jax.random.PRNGKey(0), xp)
    # identical checkpoint trees (names and shapes)
    assert jax.tree_util.tree_structure(vf) == jax.tree_util.tree_structure(vp)

    yf, mf = fine.apply(vf, x, mutable=["batch_stats"])
    yp, mp = packed.apply(vp, xp, mutable=["batch_stats"])
    np.testing.assert_allclose(
        np.asarray(unpack(yp)), np.asarray(yf), atol=1e-5
    )
    # running stats agree exactly: both paths use torch bookkeeping
    # (UNBIASED running variance, momentum 0.1) since the ADVICE r4 fix —
    # layout choice cannot perturb eval stats. Sanity-check the stored
    # value IS the unbiased one (factor m/(m-1) over the biased batch var).
    m = 2 * 6 * 6 * 6
    var_f = np.asarray(mf["batch_stats"]["BatchNorm_0"]["BatchNorm_0"]["var"])
    var_p = np.asarray(mp["batch_stats"]["BatchNorm_0"]["BatchNorm_0"]["var"])
    np.testing.assert_allclose(var_p, var_f, rtol=1e-5)
    x32 = np.asarray(x, np.float64)
    biased = x32.reshape(-1, x32.shape[-1]).var(axis=0)
    expect = 0.9 * 1.0 + 0.1 * biased * m / (m - 1)
    np.testing.assert_allclose(var_f, expect, rtol=1e-4)
    mean_f = np.asarray(mf["batch_stats"]["BatchNorm_0"]["BatchNorm_0"]["mean"])
    mean_p = np.asarray(mp["batch_stats"]["BatchNorm_0"]["BatchNorm_0"]["mean"])
    np.testing.assert_allclose(mean_p, mean_f, atol=1e-6)

    # gradients through the packed module equal the fine module's
    def loss_f(p):
        y, _ = fine.apply(
            {"params": p, "batch_stats": vf["batch_stats"]}, x,
            mutable=["batch_stats"],
        )
        return jnp.sum(jnp.square(y))

    def loss_p(p):
        y, _ = packed.apply(
            {"params": p, "batch_stats": vp["batch_stats"]}, xp,
            mutable=["batch_stats"],
        )
        return jnp.sum(jnp.square(y))

    gf = jax.grad(loss_f)(vf["params"])
    gp = jax.grad(loss_p)(vp["params"])
    for a, b in zip(jax.tree_util.tree_leaves(gf), jax.tree_util.tree_leaves(gp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_packed_module_matches_fine_eval():
    x = jnp.asarray(rng.standard_normal((2, 4, 4, 4, 6)), jnp.float32)
    xp = pack(x)
    fine = _FinePair(train=False)
    packed = _PackedPair(train=False)
    vf = fine.init(jax.random.PRNGKey(0), x)
    stats = {
        "BatchNorm_0": {
            "BatchNorm_0": {
                "mean": jnp.asarray(rng.standard_normal(6), jnp.float32),
                "var": jnp.asarray(1 + 0.5 * rng.random(6), jnp.float32),
            }
        }
    }
    params = vf["params"]
    yf = fine.apply({"params": params, "batch_stats": stats}, x)
    yp = packed.apply({"params": params, "batch_stats": stats}, xp)
    np.testing.assert_allclose(np.asarray(unpack(yp)), np.asarray(yf), atol=1e-5)


def test_shifted_bn_chain_equals_fine_two_convs():
    """conv_p2s -> BN(shifted, relu) -> conv_s2p == fine conv -> BN(relu)
    -> conv (the DAUNet DoubleConv core in packed space)."""
    c_in, c_mid, c_out = 3, 4, 5
    x = jnp.asarray(rng.standard_normal((2, 6, 6, 6, c_in)), jnp.float32)
    w1 = jnp.asarray(0.2 * rng.standard_normal((3, 3, 3, c_in, c_mid)), jnp.float32)
    w2 = jnp.asarray(0.2 * rng.standard_normal((3, 3, 3, c_mid, c_out)), jnp.float32)
    scale = jnp.asarray(1 + 0.1 * rng.standard_normal(c_mid), jnp.float32)
    bias = jnp.asarray(0.1 * rng.standard_normal(c_mid), jnp.float32)

    def fine(x):
        h = jax.lax.conv_general_dilated(
            x, w1, (1, 1, 1), [(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        h = _ref_bn(h, scale, bias, 1e-5, True, 1)
        return jax.lax.conv_general_dilated(
            h, w2, (1, 1, 1), [(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )

    def packed(xp):
        h = conv3_packed_p2s(xp, w1)
        h = instance_norm_relu(
            h, scale, bias, 1e-5, True, 8, (0, 1, 2), True
        )
        return conv3_packed_s2p(h, w2)

    yf = fine(x)
    yp = unpack(packed(pack(x)))
    np.testing.assert_allclose(np.asarray(yp), np.asarray(yf), atol=1e-4)

    # grads flow and match through the packed chain
    gf = jax.grad(lambda v: jnp.sum(jnp.square(fine(v))))(x)
    gp = jax.grad(lambda v: jnp.sum(jnp.square(unpack(packed(pack(v))))))(x)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gf), atol=2e-3)


def test_pooled_stats_shifted_ignores_pads():
    """pooled_stats on a packed-shifted tensor equals fine-grid stats."""
    x = jnp.asarray(rng.standard_normal((2, 6, 6, 6, 4)), jnp.float32)
    w = jnp.asarray(0.3 * rng.standard_normal((3, 3, 3, 4, 5)), jnp.float32)
    h_fine = jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    hs = conv3_packed_p2s(pack(x), w)
    mean, var, m = pooled_stats(hs, 8, (0, 1, 2))
    assert m == 2 * 6 * 6 * 6
    ref_mean = np.asarray(jnp.mean(h_fine, axis=(0, 1, 2, 3)))
    ref_var = np.asarray(jnp.var(h_fine, axis=(0, 1, 2, 3)))
    np.testing.assert_allclose(np.asarray(mean), ref_mean, atol=1e-5)
    np.testing.assert_allclose(np.asarray(var), ref_var, atol=1e-5)


def test_daunet_s2d_matches_fine():
    """da_unet with s2d level-0 packing == fine execution: same param
    tree, same outputs (train and eval), same grads (f32)."""
    from hdenseformer_tpu.models.daunet import da_unet

    x = jnp.asarray(rng.standard_normal((1, 16, 16, 16, 2)), jnp.float32)
    fine = da_unet(init_depth=16, n_channels=2, n_classes=2, s2d=False,
                   dropout_flag=False)
    packed = da_unet(init_depth=16, n_channels=2, n_classes=2, s2d=True,
                     dropout_flag=False)
    vf = fine.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    vp = packed.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    assert jax.tree_util.tree_structure(vf) == jax.tree_util.tree_structure(vp)
    for a, b in zip(jax.tree_util.tree_leaves(vf), jax.tree_util.tree_leaves(vp)):
        assert a.shape == b.shape

    # eval mode, shared weights and running stats
    yf = fine.apply(vf, x, train=False)
    yp = packed.apply(vf, x, train=False)
    assert yp.shape == yf.shape
    np.testing.assert_allclose(np.asarray(yp), np.asarray(yf), atol=2e-4)

    # train mode forward + grads
    def loss(model, v, x):
        y, _ = model.apply(v, x, train=True, mutable=["batch_stats"])
        return jnp.sum(jnp.square(y))

    lf, gf = jax.value_and_grad(lambda p: loss(
        fine, {"params": p, "batch_stats": vf["batch_stats"]}, x))(vf["params"])
    lp, gp = jax.value_and_grad(lambda p: loss(
        packed, {"params": p, "batch_stats": vf["batch_stats"]}, x))(vf["params"])
    np.testing.assert_allclose(float(lp), float(lf), rtol=1e-4)
    flat_f = jax.tree_util.tree_leaves_with_path(gf)
    flat_p = jax.tree_util.tree_leaves_with_path(gp)
    for (kf, a), (kp, b) in zip(flat_f, flat_p):
        assert kf == kp
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-3,
            err_msg=jax.tree_util.keystr(kf),
        )


def _assert_grads_close(gf, gp, rel_l2=2e-2):
    """Global relative-L2 gradient agreement across the whole pytree.

    Why not per-leaf/per-element bars: the nf=8 test model chains ~18
    sequential InstanceNorm stages whose 1/sigma gains amplify f32
    statistic rounding; a round-5 diagnostic showed (a) the packed convs
    themselves EXACT at f64 (1e-13, incl. the k7 stem lowering), (b) the
    WHOLE model at f64 params/activations (f32 stats inside, both paths)
    still drifting 0.6% at the logits purely from summation-order noise
    compounding through those gains, and (c) the worst-gradient leaf
    MOVING with the input seed (a relu/branch flip artifact, the
    measure-zero caveat in ops/fused_norm.py). A real layout bug (wrong
    parity map, misaligned tap) corrupts entire tensors and fails the
    global bar by orders of magnitude; conditioning flips perturb a few
    elements and pass it.
    """
    num = 0.0
    den = 0.0
    for (kf, a), (kp, b) in zip(
        jax.tree_util.tree_leaves_with_path(gf),
        jax.tree_util.tree_leaves_with_path(gp),
    ):
        assert kf == kp
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        num += float(np.sum((a - b) ** 2))
        den += float(np.sum(a ** 2))
    rel = (num / max(den, 1e-30)) ** 0.5
    assert rel < rel_l2, f"global grad rel-L2 {rel:.4f} >= {rel_l2}"


def test_hecktor_s2d_matches_fine():
    """Hecktor20Top1 with s2d level-1 packing == fine execution: same
    param tree, same outputs, same grads up to f32 accumulation noise.

    Tolerances are RELATIVE (scaled by each leaf's magnitude): a
    layer-by-layer capture_intermediates bisect showed the stem bitwise
    equal, the first packed conv equal to 6e-7 rel (pure f32
    reduction-order noise), and each of the ~20 downstream InstanceNorms
    amplifying that by 10-20x (gain 1/sigma), reaching ~1e-4 rel at the
    logits with no semantic jump at any module boundary. Per-block f64
    checks of every packed module (RESseNormConv, FastSmoothSENorm,
    SEWeights, VisionUp) sit at f32-eps level, bounded by the f32
    norm-statistics both paths share. A real layout bug (wrong parity
    mapping, misaligned tile) shows as O(1) error, far above these bars.
    """
    from hdenseformer_tpu.models.hecktor20top1 import Hecktor20Top1

    x = jnp.asarray(rng.standard_normal((1, 16, 16, 16, 2)), jnp.float32)
    fine = Hecktor20Top1(in_channels=2, n_cls=2, n_filters=8, s2d=False)
    packed = Hecktor20Top1(in_channels=2, n_cls=2, n_filters=8, s2d=True)
    vf = fine.init({"params": jax.random.PRNGKey(0)}, x)
    vp = packed.init({"params": jax.random.PRNGKey(0)}, x)
    assert jax.tree_util.tree_structure(vf) == jax.tree_util.tree_structure(vp)
    for a, b in zip(jax.tree_util.tree_leaves(vf), jax.tree_util.tree_leaves(vp)):
        assert a.shape == b.shape

    yf = fine.apply(vf, x)
    yp = packed.apply(vf, x)
    assert yp.shape == yf.shape
    yscale = float(jnp.max(jnp.abs(yf)))
    # bar sized to the measured conditioning (see _assert_grads_close):
    # the f64 run drifts 0.6% at the logits from f32-stat rounding alone
    np.testing.assert_allclose(
        np.asarray(yp), np.asarray(yf), atol=2e-2 * yscale
    )

    gf = jax.grad(lambda p: jnp.sum(jnp.square(fine.apply({"params": p}, x))))(
        vf["params"]
    )
    gp = jax.grad(lambda p: jnp.sum(jnp.square(packed.apply({"params": p}, x))))(
        vf["params"]
    )
    _assert_grads_close(gf, gp)


def test_hecktor_s2d_level2_matches_fine():
    """Round 5: k7 stem packed + level-2 last-dim partial-rank packing
    (s2d={1: True, 2: (2,)}) == fine execution, same bars as
    test_hecktor_s2d_matches_fine."""
    from hdenseformer_tpu.models.hecktor20top1 import Hecktor20Top1

    x = jnp.asarray(rng.standard_normal((1, 16, 16, 16, 2)), jnp.float32)
    fine = Hecktor20Top1(in_channels=2, n_cls=2, n_filters=8, s2d=False)
    packed = Hecktor20Top1(
        in_channels=2, n_cls=2, n_filters=8, s2d={1: True, 2: (2,)}
    )
    vf = fine.init({"params": jax.random.PRNGKey(0)}, x)
    vp = packed.init({"params": jax.random.PRNGKey(0)}, x)
    assert jax.tree_util.tree_structure(vf) == jax.tree_util.tree_structure(vp)
    yf = fine.apply(vf, x)
    yp = packed.apply(vf, x)
    assert yp.shape == yf.shape
    yscale = float(jnp.max(jnp.abs(yf)))
    np.testing.assert_allclose(np.asarray(yp), np.asarray(yf), atol=2e-2 * yscale)

    gf = jax.grad(lambda p: jnp.sum(jnp.square(fine.apply({"params": p}, x))))(
        vf["params"]
    )
    gp = jax.grad(lambda p: jnp.sum(jnp.square(packed.apply({"params": p}, x))))(
        vf["params"]
    )
    _assert_grads_close(gf, gp)


def test_res_da_se_unet_s2d_matches_fine():
    """Round 5: the residual DoubleConv gained a packed lowering — forcing
    s2d=True on res_da_se_unet must match the fine execution at f32."""
    from hdenseformer_tpu.models import get_net

    x = jnp.asarray(rng.standard_normal((1, 16, 16, 16, 1)), jnp.float32)
    fine = get_net("res_da_se_unet", channels=1, num_classes=2,
                   input_shape=(16, 16, 16), s2d=False)
    packed = get_net("res_da_se_unet", channels=1, num_classes=2,
                     input_shape=(16, 16, 16), s2d=True)
    vf = fine.init({"params": jax.random.PRNGKey(0)}, x)
    vp = packed.init({"params": jax.random.PRNGKey(0)}, x)
    assert jax.tree_util.tree_structure(vf) == jax.tree_util.tree_structure(vp)
    yf = fine.apply(vf, x)
    yp = packed.apply(vf, x)
    yscale = float(jnp.max(jnp.abs(yf)))
    np.testing.assert_allclose(np.asarray(yp), np.asarray(yf), atol=1e-4 * yscale)

"""Tests for ops/fused_norm.py — InstanceNorm(+affine)+ReLU custom VJP.

Ground truth is plain autodiff through the straightforward normalization
math (torch InstanceNorm semantics: biased variance, batch statistics at
train and eval — reference models/HDenseFormer.py:148-159). The custom VJP
must match values AND gradients for every combination of affine/relu/
parity (parity>1 = space-to-depth packed layout, stats pooled over the
parity groups, ops/s2d.py).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hdenseformer_tpu.ops.fused_norm import instance_norm_relu

rng = np.random.default_rng(3)


def _ref(x, scale, bias, eps, relu, parity):
    n = x.shape[0]
    fc = x.shape[-1]
    c = fc // parity
    axes = tuple(range(1, x.ndim - 1))
    x32 = x.astype(jnp.float32)
    if parity > 1:
        # pool stats over (spatial, parity-group) per original channel
        xr = x32.reshape((n,) + x.shape[1:-1] + (parity, c))
        raxes = axes + (x.ndim - 1,)
        mean = jnp.mean(xr, axis=raxes)
        var = jnp.mean(jnp.square(xr), axis=raxes) - jnp.square(mean)
        mean_b = jnp.tile(mean, (1, parity)).reshape(
            (n,) + (1,) * (x.ndim - 2) + (fc,)
        )
        var_b = jnp.tile(var, (1, parity)).reshape(
            (n,) + (1,) * (x.ndim - 2) + (fc,)
        )
    else:
        mean_b = jnp.mean(x32, axis=axes, keepdims=True)
        var_b = jnp.mean(jnp.square(x32 - mean_b), axis=axes, keepdims=True)
    y = (x32 - mean_b) * jax.lax.rsqrt(var_b + eps)
    if scale is not None:
        sc = jnp.tile(scale, (parity,)) if parity > 1 else scale
        bi = jnp.tile(bias, (parity,)) if parity > 1 else bias
        y = y * sc + bi
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(x.dtype)


CASES = [
    ((2, 6, 7, 16), True, True, 1),
    ((2, 5, 6, 7, 12), True, True, 1),
    ((2, 4, 4, 4, 8 * 6), True, True, 8),  # packed 3D
    ((2, 5, 5, 4 * 10), False, True, 4),  # packed 2D, no affine
    ((1, 6, 6, 6, 16), True, False, 1),  # no relu
    ((2, 3, 3, 3, 8 * 4), False, False, 8),
]


@pytest.mark.parametrize("shape,affine,relu,parity", CASES)
def test_values_match_reference(shape, affine, relu, parity):
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    c = shape[-1] // parity
    scale = jnp.asarray(rng.standard_normal(c), jnp.float32) if affine else None
    bias = jnp.asarray(rng.standard_normal(c), jnp.float32) if affine else None
    got = instance_norm_relu(x, scale, bias, 1e-5, relu, parity)
    ref = _ref(x, scale, bias, 1e-5, relu, parity)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("shape,affine,relu,parity", CASES)
def test_grads_match_autodiff(shape, affine, relu, parity):
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    c = shape[-1] // parity
    scale = jnp.asarray(1 + 0.1 * rng.standard_normal(c), jnp.float32) if affine else None
    bias = jnp.asarray(0.1 * rng.standard_normal(c), jnp.float32) if affine else None
    # cosine-weighted sum so dy varies per element; avoid relu kink at 0
    w = jnp.asarray(rng.standard_normal(shape), jnp.float32)

    def loss_custom(x, s, b):
        return jnp.sum(w * instance_norm_relu(x, s, b, 1e-5, relu, parity))

    def loss_ref(x, s, b):
        return jnp.sum(w * _ref(x, s, b, 1e-5, relu, parity))

    if affine:
        g = jax.grad(loss_custom, argnums=(0, 1, 2))(x, scale, bias)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
        for a, b_ in zip(g, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-4)
    else:
        g = jax.grad(lambda v: loss_custom(v, None, None))(x)
        gr = jax.grad(lambda v: loss_ref(v, None, None))(x)
        np.testing.assert_allclose(np.asarray(g), np.asarray(gr), atol=2e-4)


def test_bf16_residual_dtype():
    """The only tensor residual kept for backward is the bf16 input."""
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 8, 16)), jnp.bfloat16)
    y, vjp = jax.vjp(
        lambda v: instance_norm_relu(v, None, None, 1e-5, True, 1), x
    )
    assert y.dtype == jnp.bfloat16
    (dx,) = vjp(jnp.ones_like(y))
    assert dx.dtype == jnp.bfloat16


@pytest.mark.parametrize("affine,relu", [(True, True), (False, True), (True, False)])
def test_shifted_mode_matches_plain_mode_through_shift(affine, relu):
    """IN on a packed-SHIFTED tensor (pad slots masked from stats and
    output) == shifting the packed-plain IN result: both see the same
    multiset of real values, and pads stay zero. Values and grads."""
    from hdenseformer_tpu.ops.s2d import pack, plain_to_shifted

    nsp, C, D = 3, 3, 8
    f = 2 ** nsp
    x = jnp.asarray(rng.normal(size=(2,) + (D,) * nsp + (C,)).astype(np.float32))
    xp = pack(x)
    scale = jnp.asarray(rng.normal(size=(C,)).astype(np.float32)) if affine else None
    bias = jnp.asarray(rng.normal(size=(C,)).astype(np.float32)) if affine else None

    def via_plain(xp):
        return plain_to_shifted(
            instance_norm_relu(xp, scale, bias, 1e-5, relu, f)
        )

    def via_shifted(xp):
        return instance_norm_relu(
            plain_to_shifted(xp), scale, bias, 1e-5, relu, f, True
        )

    np.testing.assert_allclose(
        via_shifted(xp), via_plain(xp), rtol=1e-5, atol=1e-5
    )
    r = jnp.asarray(
        rng.normal(size=via_plain(xp).shape).astype(np.float32)
    )
    ga = jax.grad(lambda t: jnp.sum((via_plain(t) * r) ** 2))(xp)
    gb = jax.grad(lambda t: jnp.sum((via_shifted(t) * r) ** 2))(xp)
    np.testing.assert_allclose(gb, ga, rtol=1e-4, atol=1e-4)

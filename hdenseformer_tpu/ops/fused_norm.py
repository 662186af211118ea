"""InstanceNorm(+affine)+ReLU with a hand-written VJP and bf16 residuals.

torch-semantics InstanceNorm (biased variance, eps, batch statistics at
train AND eval — reference models/HDenseFormer.py:148-159) followed by an
optional ReLU, for both the fine-grid layout (parity=1) and the
space-to-depth packed layout (parity=2^d, ops/s2d.py) where statistics
per original channel pool over (spatial, parity-group).

Why not plain autodiff: under bf16 compute, XLA saves the forward's
``x.astype(f32)`` as a backward residual (a full-resolution fp32 copy)
and emits several unfused normalization passes — the round-3 144^3 trace
attributes ~72 ms/step to these reads/writes (~47 GB of traffic vs the
~6 GB the math needs; baselines/profile_notes.md). This custom VJP keeps
the ONLY tensor residual in the input dtype (bf16) plus tiny per-(n,c)
f32 stat vectors.

Fusion-boundary discipline (the round-3 p2s trace showed ~20 ms/step of
materialized f32[73^3 x 256] intermediates + their layout copies at the
packed level): a full-resolution f32 value consumed by MORE THAN ONE
fused pass gets materialized to HBM by XLA (CSE unifies the duplicate
expressions, then the multi-consumer node can't duplicate into every
fusion). So every pass here is phrased to read only the bf16 inputs
(x, dy — converts are freely re-fused per consumer) plus tiny per-(n,c)
f32 vectors, and any masking/weighting is applied INSIDE a single pass:

  forward:   mean reduce | centered-sq reduce | normalize pass
  backward:  one (t1, t2) dual product-reduce | one fma dx pass

Two structural tricks make the backward single-consumer:

- the ReLU mask is recomputed from x against a per-(n,c) THRESHOLD
  (pre = xhat*g + b > 0  <=>  x > mean - b/(g*inv) for g > 0, flipped
  for g < 0, constant for g == 0) instead of recomputing pre itself —
  recomputing pre would share the (x32 - mean) chain with the reduces;
- s2 = sum(dy_eff * xhat) is factored as inv * sum(dy_eff * (x - mean))
  (inv pulled out of the reduce) and the dx pass is expanded to the fma
  form dx = padmask * (coef*dy_eff + A + x*B) with A, B per-(n,c)
  constants — so (x32 - mean) appears in exactly one backward pass.

Both forms are algebraically identical to the centered math; their only
rounding sensitivity is LINEAR in |mean|/std (vs QUADRATIC for the
rejected one-pass variance E[x^2]-E[x]^2, which measured 1.4e-2 relative
gradient error vs torch on the full model; the centered two-pass forward
variance is kept — 8e-6, round-3 diagnostic). ReLU-boundary ties
(pre == 0 exactly) may resolve differently than the pre-form mask — a
measure-zero arbitrary-subgradient choice.

With ``shifted`` (packed-SHIFTED input, ops/s2d.py::conv3_packed_p2s
output) the pad slots are excluded from the statistics and zeroed in the
output; each mask application lives inside one pass (mask factors are
tiny per-dim constants that fuse — ops/s2d.py::shifted_mask_factors).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def _percopy(x: Array, tag: int) -> Array:
    """A structurally-distinct alias of ``x`` for one fused pass.

    The VJP below phrases every full-resolution pass to read only the
    bf16 inputs so each pass's ``astype(f32)`` re-fuses into its own
    consumer — but HLO CSE unifies the textually-identical converts
    into ONE multi-consumer node, which XLA then materializes as an
    f32 full-resolution tensor (>=31 ms/step of copies/relayouts at
    the packed level-0, round-3 trace in baselines/profile_notes.md).
    An optimization-barrier whose tuple carries a distinct constant per
    pass cannot be CSE'd, so each pass keeps a private convert. The
    barrier itself moves no data: its operand is the already-
    materialized bf16 residual.

    Gated by utils/flags.py::norm_barrier_enabled (default "auto": on
    for TPU only — the barriers defeat fusion XLA:CPU relies on and the
    HBM-traffic win they buy is TPU-specific).
    """
    from hdenseformer_tpu.utils.flags import norm_barrier_enabled

    if not norm_barrier_enabled():
        return x
    return jax.lax.optimization_barrier(
        (x, jnp.full((), tag, jnp.int32))
    )[0]


def _tile(v: Array, parity: int) -> Array:
    """(N, C) per-channel vector -> (N, parity*C) packed broadcast."""
    return jnp.tile(v, (1, parity)) if parity > 1 else v


def _bshape(x: Array):
    return (x.shape[0],) + (1,) * (x.ndim - 2) + (x.shape[-1],)


def _bc(v: Array, parity: int, x: Array) -> Array:
    """(N, C) or batch-pooled (1, C) f32 vector -> broadcastable
    (N, 1,..,1, parity*C). The materializing broadcast_to runs ONLY for
    the batch-pooled (1, C) case: on the (N, C) InstanceNorm path it was
    pure graph noise added in round 4 (a prime suspect while bisecting
    the BENCH_r04 regression — keep this path bit-identical to round 3)."""
    if v.shape[0] != x.shape[0]:
        v = jnp.broadcast_to(v, (x.shape[0], v.shape[-1]))
    return _tile(v, parity).reshape(_bshape(x))


def _vec(v: Array, parity: int, x: Array) -> Array:
    """(C,) parameter -> broadcastable (1,..,1,parity*C) in f32."""
    v = v.astype(jnp.float32)
    if parity > 1:
        v = jnp.tile(v, (parity,))
    return v.reshape((1,) * (x.ndim - 1) + (v.shape[-1],))


def _sdims(x: Array, shifted) -> tuple:
    """Packed-dim indices of a shifted layout: ``shifted`` is False, True
    (fully packed) or a tuple of packed spatial dims (partial-rank)."""
    if shifted is True:
        return tuple(range(x.ndim - 2))
    return tuple(shifted)


def _count(x: Array, parity: int, shifted) -> int:
    """Elements per (sample, original channel) statistics set. A
    packed-SHIFTED tensor (g+1 cells per packed dim, ops/s2d.py) is a
    bijection of the zero-extended fine grid: the true count is
    parity * prod(packed: s_i - 1) * prod(unpacked: s_i), excluding the
    pad slots."""
    if shifted:
        dims = _sdims(x, shifted)
        assert parity == 2 ** len(dims), "parity must match shifted dims"
    m = parity
    for i, s in enumerate(x.shape[1:-1]):
        m *= (s - 1) if (shifted and i in dims) else s
    return m


def _mask(y: Array, shifted) -> Array:
    """Apply the shifted-layout pad mask (no-op when not shifted). Call
    INSIDE each fused pass, on that pass's own expression — never on a
    value shared across passes (see module docstring)."""
    if not shifted:
        return y
    from hdenseformer_tpu.ops.s2d import apply_shifted_mask

    return apply_shifted_mask(y, dims=_sdims(y, shifted))


def _group(v: Array, parity: int) -> Array:
    """(N, parity*C) reduced vector -> (N, C) summed over parity blocks."""
    if parity == 1:
        return v
    n, fc = v.shape
    return jnp.sum(v.reshape(n, parity, fc // parity), axis=1)


def _bpool(v: Array, batch_pooled: bool) -> Array:
    """(N, C) per-sample vector -> (1, C) summed over the batch when the
    statistics pool over it (BatchNorm semantics)."""
    return jnp.sum(v, axis=0, keepdims=True) if batch_pooled else v


def _stats(x: Array, parity: int, shifted: bool = False, batch_pooled: bool = False):
    """Centered biased moments per (sample, original channel).

    Returns the flat (N, C) mean/var, the broadcast mean, and the element
    count m. Two-pass: mean, then E[(x-mean)^2] — see module docstring for
    why not one-pass. With ``shifted`` the pad slots are excluded from
    both passes (mask applied inside each pass's own chain). With
    ``batch_pooled`` the statistics additionally pool over the batch axis
    (BatchNorm semantics, reference models/DAUNet.py:49-63) and the
    returned vectors are (1, C).
    """
    axes = tuple(range(1, x.ndim - 1))
    m = _count(x, parity, shifted) * (x.shape[0] if batch_pooled else 1)
    # mean / variance reduce passes each read a private alias of x so
    # their astype(f32) converts stay in-pass (see _percopy)
    m1 = _bpool(_group(
        jnp.sum(_mask(_percopy(x, 10).astype(jnp.float32), shifted), axis=axes),
        parity,
    ), batch_pooled) / m
    mean_bc = _bc(m1, parity, x)
    v = _bpool(_group(
        jnp.sum(
            _mask(
                jnp.square(_percopy(x, 11).astype(jnp.float32) - mean_bc),
                shifted,
            ),
            axis=axes,
        ),
        parity,
    ), batch_pooled) / m
    return m1, v, mean_bc, m


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def instance_norm_relu(
    x: Array,
    scale: Optional[Array],
    bias: Optional[Array],
    epsilon: float = 1e-5,
    relu: bool = True,
    parity: int = 1,
    shifted=False,
    batch_pooled: bool = False,
) -> Array:
    """With ``shifted`` (True = fully packed, or a tuple of packed dims
    for partial-rank layouts) the input is a packed-SHIFTED tensor
    (ops/s2d.py::conv3_packed_p2s output): pad slots are excluded from the
    statistics and zeroed in the output, so the result is directly
    consumable by ``conv3_packed_s2p`` (which treats them as the fine
    conv's SAME zero padding).

    With ``batch_pooled`` the statistics pool over the batch axis as well
    — train-mode BatchNorm semantics (biased variance, same VJP math with
    the pooled-set count); the caller owns running-stat bookkeeping
    (models/layers.py::BatchNorm)."""
    y, _ = _fwd(x, scale, bias, epsilon, relu, parity, shifted, batch_pooled)
    return y


def _normalize(x, mean_bc, inv_bc, scale, bias, relu, parity, shifted):
    """The forward normalize pass: reads bf16 x, converts in-chain."""
    y = (_percopy(x, 12).astype(jnp.float32) - mean_bc) * inv_bc
    if scale is not None:
        y = y * _vec(scale, parity, x) + _vec(bias, parity, x)
    if relu:
        y = jnp.maximum(y, 0.0)
    return _mask(y, shifted)


def _fwd(x, scale, bias, epsilon, relu, parity, shifted, batch_pooled=False):
    mean, var, mean_bc, _ = _stats(x, parity, shifted, batch_pooled)
    inv = jax.lax.rsqrt(var + epsilon)  # (N, C) or (1, C) batch-pooled
    inv_bc = _bc(inv, parity, x)
    y = _normalize(x, mean_bc, inv_bc, scale, bias, relu, parity, shifted)
    return y.astype(x.dtype), (x, mean, inv)


def _fwd_rule(x, scale, bias, epsilon, relu, parity, shifted, batch_pooled=False):
    y, (x_res, mean, inv) = _fwd(
        x, scale, bias, epsilon, relu, parity, shifted, batch_pooled
    )
    return y, (x_res, mean, inv, scale, bias)


def _relu_mask(x, mean, inv, scale, bias, parity):
    """pre > 0 recomputed as per-(n,c) thresholds on x (see module
    docstring): no full-resolution pre tensor, no chain shared with the
    reduces. Boundary ties (pre == 0) may differ from the pre-form by
    rounding — an arbitrary-subgradient choice on a measure-zero set."""
    x32 = x.astype(jnp.float32)
    if scale is None:
        return x32 > _bc(mean, parity, x)
    g = scale.astype(jnp.float32)[None]  # (1, C)
    b = bias.astype(jnp.float32)[None]
    gsafe = jnp.where(g == 0.0, 1.0, g)
    thr = mean - b / (gsafe * inv)  # (N, C)
    thr_bc = _bc(jnp.broadcast_to(thr, mean.shape), parity, x)
    g_bc = _vec(scale, parity, x)
    b_bc = _vec(bias, parity, x)
    return jnp.where(
        g_bc > 0, x32 > thr_bc, jnp.where(g_bc < 0, x32 < thr_bc, b_bc > 0)
    )


def _bwd_rule(epsilon, relu, parity, shifted, batch_pooled, res, dy):
    x, mean, inv, scale, bias = res
    m = _count(x, parity, shifted) * (x.shape[0] if batch_pooled else 1)
    axes = tuple(range(1, x.ndim - 1))

    # dy_eff in the INPUT dtype: 0/1 mask selects are exact in bf16, so
    # the one value shared by the reduce pass and the dx pass stays 2
    # bytes/element if XLA materializes it (f32 dy_eff + f32 xhat both
    # materialized before this restructure — baselines/profile_notes.md)
    dy_eff = dy
    if relu:
        dy_eff = jnp.where(
            _relu_mask(_percopy(x, 0), mean, inv, scale, bias, parity),
            dy_eff, jnp.zeros((), dy.dtype))
    if shifted:
        from hdenseformer_tpu.ops.s2d import shifted_mask_factors

        # pad slots carry no gradient (fwd output is masked there)
        nsp = x.ndim - 2
        fc = x.shape[-1]
        sdims = _sdims(x, shifted)
        factors = shifted_mask_factors(
            tuple(x.shape[1:-1]), fc, fc // parity, sdims
        )
        for i, f in factors:
            shape = (1,) * (1 + i) + (x.shape[1 + i],) + (1,) * (nsp - 1 - i) + (fc,)
            dy_eff = jnp.where(
                jnp.asarray(f, jnp.bool_).reshape(shape), dy_eff,
                jnp.zeros((), dy.dtype),
            )

    # reduce pass: private aliases of (x, dy_eff) so the f32 converts
    # belong to this pass alone (see _percopy)
    xR = _percopy(x, 1)
    dy32 = _percopy(dy_eff, 2).astype(jnp.float32)
    mean_bc = _bc(mean, parity, x)
    # dual product-reduce over (x, dy_eff): t2 centered (single consumer
    # of the (x32 - mean) chain); s2 = inv * t2 pulls inv out of the pass
    t1 = _bpool(_group(jnp.sum(dy32, axis=axes), parity), batch_pooled)
    from hdenseformer_tpu.utils.flags import norm_t2_mode

    if norm_t2_mode() == "uncentered":
        # experimental: t2 = sum(dy*x) - mean*t1 — no centered chain in
        # the reduce pass at all, error linear in |mean|/std
        t2 = _bpool(_group(
            jnp.sum(dy32 * xR.astype(jnp.float32), axis=axes), parity
        ), batch_pooled) - mean * t1
    else:
        t2 = _bpool(_group(
            jnp.sum(dy32 * (xR.astype(jnp.float32) - mean_bc), axis=axes), parity
        ), batch_pooled)
    s1, s2 = t1, inv * t2

    gamma = (
        jnp.ones_like(inv) if scale is None else scale.astype(jnp.float32)[None]
    )
    coef = gamma * inv  # (N, C)
    # dx = coef*(dy_eff - s1/m - xhat*s2/m) expanded to fma form so the
    # dx pass reads only (x, dy_eff) + per-(n,c) constants:
    #   dx = coef*dy_eff + A + x*B,  B = -coef*inv*s2/m,
    #   A = -coef*s1/m + mean*coef*inv*s2/m = -coef*s1/m - mean*B
    B = -(coef * inv) * (s2 / m)
    A = -(coef * (s1 / m)) - mean * B
    # dx pass: private aliases again — reads bf16 (x, dy_eff), converts
    # in-chain, writes bf16 dx
    dx = (
        _bc(coef, parity, x) * _percopy(dy_eff, 3).astype(jnp.float32)
        + _bc(jnp.broadcast_to(A, mean.shape), parity, x)
        + _percopy(x, 4).astype(jnp.float32)
        * _bc(jnp.broadcast_to(B, mean.shape), parity, x)
    )
    dx = _mask(dx, shifted).astype(x.dtype)

    dscale = jnp.sum(s2, axis=0).astype(scale.dtype) if scale is not None else None
    dbias = jnp.sum(s1, axis=0).astype(bias.dtype) if bias is not None else None
    return dx, dscale, dbias


instance_norm_relu.defvjp(_fwd_rule, _bwd_rule)


def pooled_stats(x: Array, parity: int = 1, shifted=False):
    """Biased (mean, var) per original channel pooled over (batch,
    spatial[, parity][, minus pad slots]) plus the pooled-set element
    count — BatchNorm running-stat bookkeeping (torch stores the
    UNBIASED variance in running_var; the caller applies m/(m-1)).

    Stop-gradiented and barrier-free: a plain two-pass reduce the caller
    runs once per train step next to the fused normalize (one extra
    fused read of the bf16 activations).
    """
    x = jax.lax.stop_gradient(x)
    axes = tuple(range(1, x.ndim - 1))
    m = _count(x, parity, shifted) * x.shape[0]
    x32 = x.astype(jnp.float32)
    mean = jnp.sum(
        _bpool(_group(jnp.sum(_mask(x32, shifted), axis=axes), parity), True),
        axis=0,
    ) / m  # (C,)
    mean_bc = _bc(mean[None], parity, x)
    var = jnp.sum(
        _bpool(
            _group(
                jnp.sum(_mask(jnp.square(x32 - mean_bc), shifted), axis=axes),
                parity,
            ),
            True,
        ),
        axis=0,
    ) / m
    return mean, var, m

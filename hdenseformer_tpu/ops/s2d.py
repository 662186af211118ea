"""Space-to-depth packed convolution: the TPU-native layout for narrow-
channel conv stages.

The v5e MXU consumes 128-lane operands; the reference's full-resolution
stages run 32/64 channels (models/HDenseFormer.py:237-244), which XLA
pads 32->128, reaching ~10 TF/s of the chip's 123 TF/s matmul ceiling
(baselines/profile_notes.md). This module re-lays those stages out
space-to-depth: each 2^d fine-grid block becomes a channel group, so a
144^3 x 32ch activation flows as 72^3 x 256ch — fully lane-aligned.

Packed order is PARITY-MAJOR: packed index = p * C + c, where p is the
fine-offset bit pattern (p_z p_y p_x) and c the original channel. This
makes every per-parity channel block a CONTIGUOUS lane range, and the
half-shift gather (``plain_to_shifted``) is POSITION-PRESERVING (block p
copies block p from a shifted cell; the block bookkeeping is folded into
``expand_kernel``'s tap factor) — zero lane movement, vs the stride-2^d
lane gathers of a channel-major order (the first cut of this module
benchmarked SLOWER end-to-end for exactly that reason).

Under this layout:

- a SAME 3^d conv on the fine grid == a VALID 2^d conv on the coarse grid
  with a structurally-expanded kernel (``expand_kernel``) applied to the
  half-shifted packing. Exact same sums, different order — measured 2.4x
  faster fwd+bwd at 144^3 x 32ch on v5e in isolation. The shift operand
  itself never needs materializing for a conv PAIR: ``conv3_packed_p2s``
  emits the half-shifted layout directly (plain input, per-dim padding
  (1,1), ``expand_kernel_p2s``) and ``conv3_packed_s2p`` consumes it, so
  conv -> norm -> conv chains run with zero shift copies (the shift
  concats were ~55 ms of the round-3 144^3 train step) — the norm in
  between masks the out-of-grid slots (``shifted_mask_factors``);
- a k2 s2 maxpool == a max over the p axis (``max_pool_packed``) — this
  also eliminates XLA's 3-D select-and-scatter backward (29 ms/step in
  the round-1 profile);
- a k3 s2 p1 op1 ConvTranspose (decoder upsample,
  models/HDenseFormer.py:211-219) == a VALID k2 conv from the coarse grid
  into packed fine channels (``conv_transpose_packed``) — no input
  dilation at all;
- a 1^d conv (deep-supervision heads) == ONE matmul with a
  block-diagonal expanded weight (``conv1_packed``) — no data reshuffle;
- InstanceNorm (``instance_norm_relu_packed``) reduces over spatial only,
  then regroups the per-packed-channel moments on a length-2^d*C vector —
  the (c, p) regroup never touches the activation tensor.

The expansion carries a 2^(2d)*2^d/3^d FLOP redundancy (2.37x for d=3:
64 dense vs 27 useful taps) but runs at full MXU utilization, a large
net win below 128 channels. All ops are plain XLA (conv_general_dilated/
reshape/slice), so autodiff, jit, pjit sharding and CPU tests work
unchanged.
"""
from __future__ import annotations

from functools import lru_cache
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def _dim_numbers(nsp: int):
    if nsp == 2:
        return ("NHWC", "HWIO", "NHWC")
    if nsp == 3:
        return ("NDHWC", "DHWIO", "NDHWC")
    raise ValueError(f"unsupported spatial rank {nsp}")


@lru_cache(maxsize=None)
def _tap_factor(transpose: bool) -> np.ndarray:
    """Per-dimension factor A[u, p, q, k].

    Forward (SAME k3): shifted cell j+u (u in {0,1}), block POSITION p
    holds fine position 2(j+u) - p (``plain_to_shifted`` stores block p
    from source cell j - p — position-preserving, zero lane movement);
    output fine position 2j + q needs kernel tap t = (2u - p) - q in
    {-1, 0, 1}, i.e. kernel index k = t + 1 = 2u - p - q + 1.

    Transpose (torch ConvTranspose k3 s2 p1 op1): output fine position
    o = 2j + q receives in[i] * w[k] where o = 2i + k - 1; with coarse
    input cell i = j + u (u in {0,1}) that is k = q - 2u + 1.
    """
    A = np.zeros((2, 2, 2, 3), np.float32)
    for u in range(2):
        for p in range(2):
            for q in range(2):
                k = (q - 2 * u + 1) if transpose else (2 * u - p - q + 1)
                if transpose and p != 0:
                    continue  # transpose input is unpacked: only p=0 used
                if 0 <= k <= 2:
                    A[u, p, q, k] = 1.0
    return A


@lru_cache(maxsize=None)
def _tap_factor_p2s() -> np.ndarray:
    """Per-dimension factor A2[u, q_in, p_out, k] for the plain->SHIFTED
    conv form (``conv3_packed_p2s``).

    Output shifted slot (j, p) is fine position 2j - p; the fine SAME-k3
    conv needs in_fine[2j - p + k - 1] = plain cell m block q with
    q = (p + k - 1) mod 2 and m - j = (k - 1 - p - q) / 2 in {-1, 0},
    i.e. conv tap u = (m - j) + 1 under per-dim padding (1, 1).

    Same 6 nonzero (p, k) entries per dim as the forward factor — the
    p2s and s2p forms carry identical 2.37x FLOP redundancy; what p2s
    buys is that its OUTPUT is exactly the half-shifted operand the next
    ``conv3_packed_s2p`` consumes, so the chain conv->IN->conv executes
    with ZERO shift materializations (the round-3 trace put ~55 ms/step
    of the 144^3 train step in shift concats, baselines/profile_notes.md).
    """
    A = np.zeros((2, 2, 2, 3), np.float32)
    for p in range(2):
        for k in range(3):
            q = (p + k - 1) % 2
            u = (k - 1 - p - q) // 2 + 1
            assert (k - 1 - p - q) % 2 == 0 and 0 <= u <= 1
            A[u, q, p, k] = 1.0
    return A


def expand_kernel(w: Array) -> Array:
    """(3,..,3, C, Co) fine SAME-conv kernel -> (2,..,2, 2^d*C, 2^d*Co)
    packed VALID-conv kernel (parity-major packed order)."""
    nsp = w.ndim - 2
    A = jnp.asarray(_tap_factor(False), w.dtype)
    if nsp == 3:
        Wp = jnp.einsum("aPQk,bRSl,cTUm,klmio->abcPRTiQSUo", A, A, A, w)
    else:
        Wp = jnp.einsum("aPQk,bRSl,klio->abPRiQSo", A, A, w)
    C, Co = w.shape[-2], w.shape[-1]
    f = 2 ** nsp
    return Wp.reshape((2,) * nsp + (f * C, f * Co))


def expand_kernel_p2s(w: Array) -> Array:
    """(3,..,3, C, Co) fine SAME-conv kernel -> (2,..,2, 2^d*C, 2^d*Co)
    packed kernel for the plain->shifted conv form (``conv3_packed_p2s``)."""
    nsp = w.ndim - 2
    A = jnp.asarray(_tap_factor_p2s(), w.dtype)
    if nsp == 3:
        Wp = jnp.einsum("aPQk,bRSl,cTUm,klmio->abcPRTiQSUo", A, A, A, w)
    else:
        Wp = jnp.einsum("aPQk,bRSl,klio->abPRiQSo", A, A, w)
    C, Co = w.shape[-2], w.shape[-1]
    f = 2 ** nsp
    return Wp.reshape((2,) * nsp + (f * C, f * Co))


def expand_kernel_transpose(w: Array) -> Array:
    """torch-layout ConvTranspose kernel, already converted to the
    equivalent-conv form used by models/layers.py::ConvTranspose
    ((3,..,3, C_in, C_out), spatially flipped) -> (2,..,2, C_in, 2^d*C_out)
    packed kernel: a VALID k2 coarse conv producing packed fine outputs.

    models/layers.py stores the transposed conv as an equivalent dilated
    conv whose kernel is the flipped torch kernel; un-flip to recover
    w_t[k] and apply o = 2i + k - 1 (k3 s2 p1 op1, ref
    models/HDenseFormer.py:211-219).
    """
    nsp = w.ndim - 2
    wt = jnp.flip(w, axis=tuple(range(nsp)))  # back to torch tap order
    A = jnp.asarray(_tap_factor(True)[:, 0], w.dtype)  # (u, q, k)
    if nsp == 3:
        Wp = jnp.einsum("aQk,bSl,cUm,klmio->abciQSUo", A, A, A, wt)
    else:
        Wp = jnp.einsum("aQk,bSl,klio->abiQSo", A, A, wt)
    C, Co = w.shape[-2], w.shape[-1]
    return Wp.reshape((2,) * nsp + (C, (2 ** nsp) * Co))


def pack(x: Array) -> Array:
    """(N, *fine, C) -> (N, *fine/2, 2^d * C), parity-major packed."""
    nsp = x.ndim - 2
    n, c = x.shape[0], x.shape[-1]
    g = tuple(s // 2 for s in x.shape[1:-1])
    shape = (n,)
    for gs in g:
        shape += (gs, 2)
    shape += (c,)
    xp = x.reshape(shape)
    # (n, g0, 2, g1, 2, ..., c) -> (n, g0, g1, ..., 2, 2, ..., c)
    perm = (
        (0,)
        + tuple(1 + 2 * i for i in range(nsp))
        + tuple(2 + 2 * i for i in range(nsp))
        + (1 + 2 * nsp,)
    )
    xp = xp.transpose(perm)
    return xp.reshape((n,) + g + (c * 2 ** nsp,))


def unpack(xp: Array) -> Array:
    nsp = xp.ndim - 2
    n, c8 = xp.shape[0], xp.shape[-1]
    f = 2 ** nsp
    c = c8 // f
    g = xp.shape[1:-1]
    x = xp.reshape((n,) + tuple(g) + (2,) * nsp + (c,))
    # (n, g..., p..., c) -> (n, g0, p0, g1, p1, ..., c)
    perm = (0,)
    for i in range(nsp):
        perm += (1 + i, 1 + nsp + i)
    perm += (1 + 2 * nsp,)
    x = x.transpose(perm)
    return x.reshape((n,) + tuple(2 * s for s in g) + (c,))


def plain_to_shifted(xp: Array) -> Array:
    """Packed-plain (cells cover fine [2j, 2j+1]) -> packed-shifted
    (one extra cell per dim, zero-padded boundary == the fine conv's
    SAME padding): shifted cell j, block p holds fine position 2j - p.

    POSITION-PRESERVING: block p copies block p (the identical contiguous
    C-channel lane range) from the neighbor cell j - p — zero lane
    movement; the block bookkeeping lives entirely in ``expand_kernel``'s
    tap factor. This is what lets ``ops/shift_pack.py`` phrase the op as
    full-128-lane plane copies with lane-masked plane/shift selection.
    """
    nsp = xp.ndim - 2
    n, c8 = xp.shape[0], xp.shape[-1]
    f = 2 ** nsp
    c = c8 // f
    g = xp.shape[1:-1]
    pad = ((0, 0),) + ((1, 1),) * nsp + ((0, 0),)
    xr = jnp.pad(xp, pad)
    pieces = []
    for mask in range(f):
        pbits = [(mask >> (nsp - 1 - i)) & 1 for i in range(nsp)]
        idx = (slice(None),)
        for i, pb in enumerate(pbits):
            # padded coords: j in [-1, g]; want source j - pb for
            # shifted j in [0, g], i.e. padded range [1-pb, 1-pb + g + 1)
            idx += (slice(1 - pb, 1 - pb + g[i] + 1),)
        idx += (slice(mask * c, (mask + 1) * c),)
        pieces.append(xr[idx])
    return jnp.concatenate(pieces, axis=-1)


def conv3_packed(xp: Array, w: Array, dtype=None) -> Array:
    """SAME 3^d conv on the fine grid, computed in packed space.

    xp: packed-plain (N, *g, 2^d*C); w: fine kernel (3,..,3, C, Co).
    Returns packed-plain (N, *g, 2^d*Co).
    """
    nsp = xp.ndim - 2
    dt = dtype or xp.dtype
    # shift_pack is a residual-free custom_vjp (the op is linear): no
    # second (g+1)^d x 2^d C residual is kept alive per conv (~200 MB
    # each at 144^3 x 32ch), and no backward-pass recompute either.
    # Cast BEFORE the shift: halves the copy's traffic when the input is
    # f32 and keeps the pallas kernel on bf16 blocks.
    from hdenseformer_tpu.ops.shift_pack import shift_pack

    xs = shift_pack(xp.astype(dt))
    wexp = expand_kernel(w).astype(dt)
    return jax.lax.conv_general_dilated(
        xs, wexp, (1,) * nsp, "VALID",
        dimension_numbers=_dim_numbers(nsp),
    )


def conv3_packed_p2s(xp: Array, w: Array, dtype=None) -> Array:
    """SAME 3^d fine conv, packed-plain input -> packed-SHIFTED output.

    Output slot (cell j, block p) holds fine position 2j - p over
    j in [0, g] ((g+1)^d cells). Slots outside the fine grid (per dim:
    j=0 with p=1, j=g with p=0) hold conv garbage and MUST be zero-masked
    by the consumer (``ops.fused_norm.instance_norm_relu(shifted=True)``
    does; ``shifted_mask_factors`` builds the mask) before the values are
    read as zero padding by ``conv3_packed_s2p``.
    """
    nsp = xp.ndim - 2
    dt = dtype or xp.dtype
    wexp = expand_kernel_p2s(w).astype(dt)
    return jax.lax.conv_general_dilated(
        xp.astype(dt), wexp, (1,) * nsp, [(1, 1)] * nsp,
        dimension_numbers=_dim_numbers(nsp),
    )


def conv3_packed_s2p(xs: Array, w: Array, dtype=None) -> Array:
    """SAME 3^d fine conv, packed-SHIFTED input -> packed-plain output.

    The input is what ``conv3_packed_p2s`` (after pad masking) or
    ``plain_to_shifted`` produces; this is ``conv3_packed`` minus the
    shift — a plain VALID 2^d conv with the expanded kernel.
    """
    nsp = xs.ndim - 2
    dt = dtype or xs.dtype
    wexp = expand_kernel(w).astype(dt)
    return jax.lax.conv_general_dilated(
        xs.astype(dt), wexp, (1,) * nsp, "VALID",
        dimension_numbers=_dim_numbers(nsp),
    )


@lru_cache(maxsize=None)
def shifted_mask_factors(gshape: tuple, fc: int, c: int):
    """Per-dim (g_i + 1, fC) float32 {0,1} factors whose broadcast product
    masks the out-of-grid slots of a packed-shifted tensor: slot (j, p) is
    a pad iff per some dim (j == 0 and p-bit == 1) or (j == g and
    p-bit == 0). Kept factored (a few KB each) so XLA fuses the masking
    multiplies into neighboring elementwise work instead of materializing
    a full-resolution mask."""
    nsp = len(gshape)
    pidx = np.arange(fc) // c
    out = []
    for i in range(nsp):
        b = (pidx >> (nsp - 1 - i)) & 1
        m = np.ones((gshape[i] + 1, fc), np.float32)
        m[0, b == 1] = 0.0
        m[gshape[i], b == 0] = 0.0
        out.append(m)
    return tuple(out)


def apply_shifted_mask(y: Array, dtype=None) -> Array:
    """Zero the pad slots of a packed-shifted tensor (broadcast product of
    ``shifted_mask_factors``; fuses into neighboring elementwise ops)."""
    nsp = y.ndim - 2
    fc = y.shape[-1]
    c = fc // (2 ** nsp)
    g = tuple(s - 1 for s in y.shape[1:-1])
    dt = dtype or y.dtype
    for i, m in enumerate(shifted_mask_factors(g, fc, c)):
        shape = (1,) * (1 + i) + (y.shape[1 + i],) + (1,) * (nsp - 1 - i) + (fc,)
        y = y * jnp.asarray(m, dt).reshape(shape)
    return y


def conv_transpose_packed(x: Array, w_equiv: Array, bias=None, dtype=None) -> Array:
    """torch ConvTranspose(k3, s2, p1, op1) fine upsample, packed output.

    x: UNPACKED coarse grid (N, *g, C); w_equiv: the equivalent-conv
    kernel stored by models/layers.py::ConvTranspose. Returns
    packed-plain (N, *g, 2^d*Co) on the same coarse grid = the 2x fine
    grid. Coarse taps are {j, j+1}: pad high side by one cell.
    """
    nsp = x.ndim - 2
    dt = dtype or x.dtype
    wexp = expand_kernel_transpose(w_equiv).astype(dt)
    y = jax.lax.conv_general_dilated(
        x.astype(dt), wexp, (1,) * nsp, [(0, 1)] * nsp,
        dimension_numbers=_dim_numbers(nsp),
    )
    if bias is not None:
        f = 2 ** nsp
        y = y + jnp.tile(bias.astype(y.dtype), f)
    return y


@jax.custom_vjp
def dot_f32out(x: Array, w: Array) -> Array:
    """Channel matmul reading x/w in their (bf16) compute dtype with f32
    MXU accumulation and f32 output — the logits-head primitive.

    Plain ``preferred_element_type=f32`` breaks under autodiff (the
    transposed op mixes the f32 cotangent with the bf16 kernel, which
    conv/dot reject); this custom VJP casts the cotangent back to the
    compute dtype for both backward products — the same rounding every
    other bf16 layer's gradient already undergoes.
    """
    return jax.lax.dot_general(
        x, w, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _dot_f32out_fwd(x, w):
    return dot_f32out(x, w), (x, w)


def _dot_f32out_bwd(res, dy):
    x, w = res
    dyc = dy.astype(x.dtype)
    dx = jax.lax.dot_general(
        dyc, w, (((dyc.ndim - 1,), (1,)), ((), ()))
    ).astype(x.dtype)
    xm = x.reshape(-1, x.shape[-1])
    dym = dyc.reshape(-1, dyc.shape[-1])
    dw = jax.lax.dot_general(
        xm, dym, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(w.dtype)
    return dx, dw


dot_f32out.defvjp(_dot_f32out_fwd, _dot_f32out_bwd)


def conv1_packed(xp: Array, w1: Array, bias=None) -> Array:
    """1^d conv (e.g. a deep-supervision head) in packed space, f32 out.

    Lowered as ONE (2^d C, 2^d Co) matmul with a block-diagonal expanded
    weight — no activation reshuffling at all. The dot runs in the
    activation dtype with f32 MXU accumulation (preferred_element_type):
    casting the full-resolution activation to f32 first materialized
    ~600 MB/step of extra traffic at 144^3 (round-3 trace) for precision
    the f32 accumulate already provides; output and bias stay f32.
    """
    nsp = xp.ndim - 2
    f = 2 ** nsp
    c = xp.shape[-1] // f
    co = w1.shape[-1]
    w = w1.reshape(c, co).astype(xp.dtype)
    eye = jnp.eye(f, dtype=xp.dtype)
    wexp = jnp.einsum("pq,co->pcqo", eye, w).reshape(f * c, f * co)
    y = dot_f32out(xp, wexp)
    if bias is not None:
        y = y + jnp.tile(bias.astype(jnp.float32), f)
    return y


def max_pool_packed(xp: Array) -> Array:
    """k2 s2 maxpool of the fine grid == a max over the p axis. Returns
    the UNPACKED coarse grid (which is the next stage's fine grid)."""
    nsp = xp.ndim - 2
    f = 2 ** nsp
    c = xp.shape[-1] // f
    xr = xp.reshape(xp.shape[:-1] + (f, c))
    return jnp.max(xr, axis=-2)


def instance_norm_relu_packed(
    xp: Array,
    scale: Optional[Array] = None,
    bias: Optional[Array] = None,
    epsilon: float = 1e-5,
    relu: bool = True,
) -> Array:
    """InstanceNorm(+affine)+ReLU over the fine grid, in packed space.

    Statistics per (sample, original channel) reduce over (spatial, p) —
    computed as per-PACKED-channel spatial moments (a standard lane-wise
    reduction) followed by the (p, c) regroup on the length-2^d*C moment
    vectors, so the activation tensor itself is never reshuffled.
    """
    nsp = xp.ndim - 2
    f = 2 ** nsp
    c = xp.shape[-1] // f
    x32 = xp.astype(jnp.float32)
    axes = tuple(range(1, xp.ndim - 1))
    m1 = jnp.mean(x32, axis=axes)  # (N, f*C) per packed channel
    m2 = jnp.mean(jnp.square(x32), axis=axes)
    mean_c = jnp.mean(m1.reshape(-1, f, c), axis=1)  # (N, C)
    m2_c = jnp.mean(m2.reshape(-1, f, c), axis=1)
    var_c = m2_c - jnp.square(mean_c)
    mean = jnp.tile(mean_c, (1, f))  # back to packed channels
    inv = jnp.tile(jax.lax.rsqrt(var_c + epsilon), (1, f))
    shape = (xp.shape[0],) + (1,) * nsp + (f * c,)
    y = (x32 - mean.reshape(shape)) * inv.reshape(shape)
    if scale is not None:
        y = y * jnp.tile(scale.astype(jnp.float32), f)
    if bias is not None:
        y = y + jnp.tile(bias.astype(jnp.float32), f)
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(xp.dtype)


def upsample2x_packed(x: Array) -> Array:
    """x2 half-pixel linear upsample (torch ``align_corners=False``), with
    the fine output emitted directly in packed-plain layout.

    Per dim: out_fine[2j] = 0.25 in[j-1] + 0.75 in[j] and
    out_fine[2j+1] = 0.75 in[j] + 0.25 in[j+1] (edge-clamped) — exactly
    ``ops/resize.py::upsample_linear`` composed with ``pack``, but as a
    handful of shifted adds on the coarse grid instead of fine-grid
    interpolation + repacking.
    """
    nsp = x.ndim - 2
    t = x
    for d in range(nsp):
        ax = 1 + d
        pad = [(0, 0)] * t.ndim
        pad[ax] = (1, 1)
        tp = jnp.pad(t, pad, mode="edge")
        g = t.shape[ax]

        def sl(a, b):
            return tuple(
                slice(a, b) if i == ax else slice(None) for i in range(t.ndim)
            )

        lo = tp[sl(0, g)]
        hi = tp[sl(2, g + 2)]
        even = 0.25 * lo + 0.75 * t
        odd = 0.75 * t + 0.25 * hi
        # parity axes accumulate BEFORE the channel axis (parity-major)
        t = jnp.stack([even, odd], axis=1 + nsp + d)
    return t.reshape(t.shape[: 1 + nsp] + (-1,))


def concat_packed(tensors) -> Array:
    """Channel concat in packed space: per-parity interleave of the
    constituent channel blocks."""
    nsp = tensors[0].ndim - 2
    f = 2 ** nsp
    parts = [t.reshape(t.shape[:-1] + (f, t.shape[-1] // f)) for t in tensors]
    out = jnp.concatenate(parts, axis=-1)
    return out.reshape(out.shape[:-2] + (-1,))

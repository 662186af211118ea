"""Pallas half-shift gather for space-to-depth packed convolution.

``ops/s2d.py::plain_to_shifted`` is the data-movement heart of the packed
conv path: shifted cell j, block p holds packed-plain cell j - p, block p
(position-preserving — see s2d.py). As plain XLA this lowers to 2^d
channel-block slices + a channel concatenate whose sub-128-lane pieces
force read-modify-write tile updates — measured 48 GB/s and ~66 ms of
the 144^3 train step (round-3 trace, baselines/profile_notes.md).

Because the layout is position-preserving, the op touches ONLY full
128-lane vectors: per output spatial plane, each lane's value comes from
one of two input planes (leading-dim parity bit of its block), sub-shifted
by 0/-1 in each inner dim (that dim's parity bit). Both choices are
resolved with lane-index masks (``broadcasted_iota`` over the lane dim),
so the kernel is a handful of full-width selects over statically-shaped
shifted variants — no sub-lane loads, stores, or relayouts.

The op is a pure per-element *bijection* (each input element lands in
exactly one output slot), so both the forward and its transpose are
shifted copies — no accumulation. A ``jax.custom_vjp`` ties them together
with NO residuals (the op is linear), which also removes the
``jax.checkpoint`` recompute the XLA path needed. That custom_vjp is the
part that ships: conv3_packed always routes through ``shift_pack``.

The Pallas kernel itself is benchmark-gated OFF (see ``_use_pallas``):
isolated it beats the XLA slice/concat ~2.5x, but inside the compiled
train step the custom call acts as a fusion barrier and the end-to-end
step regresses 333 -> 377 ms (round-3 144^3 A/B, PARITY.md). It remains
here, exact and tested (interpret-mode parity in tests/test_shift_pack.py,
on-TPU numerics verified 2026-08-17), as the fallback if a future
XLA/Mosaic version changes the trade.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

Array = jax.Array


# ---------------------------------------------------------------------------
# XLA reference implementations (CPU fallback + numerical ground truth)
# ---------------------------------------------------------------------------


def shift_pack_xla(xp: Array) -> Array:
    """packed-plain (N, *g, 2^d C) -> packed-shifted (N, *(g+1), 2^d C)."""
    from hdenseformer_tpu.ops.s2d import plain_to_shifted

    return plain_to_shifted(xp)


def shift_unpack_xla(dxs: Array) -> Array:
    """Transpose of ``shift_pack_xla``: (N, *(g+1), FC) -> (N, *g, FC).

    Per dim: dxp[j][block q] = dxs[j + q][block q] (always in range).
    """
    nsp = dxs.ndim - 2
    f = 2 ** nsp
    c = dxs.shape[-1] // f
    g = tuple(s - 1 for s in dxs.shape[1:-1])
    pieces = []
    for mask in range(f):
        qbits = [(mask >> (nsp - 1 - i)) & 1 for i in range(nsp)]
        idx = (slice(None),)
        for i, qb in enumerate(qbits):
            idx += (slice(qb, qb + g[i]),)
        idx += (slice(mask * c, (mask + 1) * c),)
        pieces.append(dxs[idx])
    return jnp.concatenate(pieces, axis=-1)


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------


def _lane_bit_masks(nsp: int, c: int, ck: int, kc):
    """Per-lane parity-bit masks, shape (1,)*(nsp-1) + (ck,), bool.

    Lane L of chunk kc is packed channel kc*ck + L = p*c + ch; returns
    [bit_0(p), ..., bit_{nsp-1}(p)] (bit 0 = leading spatial dim).
    """
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, ck), 1)
    p = (kc * ck + lane) // c
    masks = []
    for i in range(nsp):
        bit = (p >> (nsp - 1 - i)) & 1
        masks.append((bit == 1).reshape((1,) * (nsp - 2) + (1, ck)))
    return masks


def _fwd_kernel(lo_ref, hi_ref, out_ref, *, nsp, c, ck, g_sp):
    """One output plane x one 128-lane channel chunk, all full-width.

    lo/hi are input planes i-1 and i (edge-clamped). Per lane: plane
    choice by the block's leading parity bit, inner-dim 0/-1 sub-shift by
    the inner parity bits, boundary zeroing by plane index — every select
    is a lane-masked full-width ``where``.
    """
    from jax.experimental import pallas as pl

    i = pl.program_id(1)
    kc = pl.program_id(2)
    g0 = pl.num_programs(1) - 1  # out planes = g0 + 1
    dt = out_ref.dtype
    masks = _lane_bit_masks(nsp, c, ck, kc)

    sl = (0, 0) + (slice(None),) * (nsp - 1) + (slice(None),)
    lo = lo_ref[sl]
    hi = hi_ref[sl]
    # leading dim: block bit 1 -> source cell i-1 (lo), bit 0 -> cell i (hi).
    # Boundary zeroing via scalar 0/1 multipliers folded into the select
    # operands (a bool-vector-valued where lowers to an i1 vector trunc
    # Mosaic rejects; float select with a cmp mask is fine).
    lo_ok = (i >= 1).astype(dt)
    hi_ok = (i <= g0 - 1).astype(dt)
    src = jnp.where(masks[0], lo * lo_ok, hi * hi_ok)
    # inner dims: bit 0 -> rows [0..g-1] + zero tail, bit 1 -> zero head
    for d in range(1, nsp):
        ax = d - 1  # axis within the (g1[, g2], ck) value
        zshape = list(src.shape)
        zshape[ax] = 1
        z = jnp.zeros(zshape, dt)
        v0 = jnp.concatenate([src, z], axis=ax)
        v1 = jnp.concatenate([z, src], axis=ax)
        src = jnp.where(masks[d], v1, v0)
    out_ref[sl] = src


def _bwd_kernel(lo_ref, hi_ref, out_ref, *, nsp, c, ck, g_sp):
    """One input-gradient plane x one 128-lane channel chunk.

    dxp[j][block q] = dxs[j + q0][inner + (q1, q2)][block q] — always in
    range, no masking; lo/hi are shifted planes j and j+1.
    """
    from jax.experimental import pallas as pl

    kc = pl.program_id(2)
    masks = _lane_bit_masks(nsp, c, ck, kc)

    sl = (0, 0) + (slice(None),) * (nsp - 1) + (slice(None),)
    lo = lo_ref[sl]
    hi = hi_ref[sl]
    src = jnp.where(masks[0], hi, lo)  # bit 1 -> plane j+1
    for d in range(1, nsp):
        ax = d - 1
        g = g_sp[d]
        idx0 = tuple(
            slice(0, g) if a == ax else slice(None) for a in range(src.ndim)
        )
        idx1 = tuple(
            slice(1, g + 1) if a == ax else slice(None)
            for a in range(src.ndim)
        )
        src = jnp.where(masks[d], src[idx1], src[idx0])
    out_ref[sl] = src


def _chunking(fc: int, nsp: int):
    f = 2 ** nsp
    c = fc // f
    if fc % 128 != 0:
        # sub-128 lane counts get padded to 128 inside the kernel blocks
        # (8x VMEM waste at fc=16 -> scoped-vmem OOM at 72^3 planes) and
        # are cheap for XLA anyway -> XLA path
        return None
    ck = 128
    if ck % c != 0:
        return None
    return c, ck, fc // ck


def _pallas_shift(x: Array, forward: bool, interpret: bool = False) -> Array:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nsp = x.ndim - 2
    n = x.shape[0]
    fc = x.shape[-1]
    ch = _chunking(fc, nsp)
    assert ch is not None
    c, ck, nchunks = ch
    if forward:
        g_sp = x.shape[1:-1]
        out_sp = tuple(s + 1 for s in g_sp)
        n_planes = g_sp[0] + 1
        kern = _fwd_kernel
        # lo = plane i-1 (clamped), hi = plane i (clamped)
        lo_map = lambda nn, i, kc: (nn, jnp.maximum(i - 1, 0), *([0] * (nsp - 1)), kc)
        hi_map = lambda nn, i, kc: (nn, jnp.minimum(i, g_sp[0] - 1), *([0] * (nsp - 1)), kc)
        in_sp = g_sp
    else:
        gs = tuple(s - 1 for s in x.shape[1:-1])  # output (dxp) spatial
        g_sp = gs
        out_sp = gs
        n_planes = gs[0]
        kern = _bwd_kernel
        lo_map = lambda nn, j, kc: (nn, j, *([0] * (nsp - 1)), kc)
        hi_map = lambda nn, j, kc: (nn, j + 1, *([0] * (nsp - 1)), kc)
        in_sp = x.shape[1:-1]

    in_block = (1, 1) + tuple(in_sp[1:]) + (ck,)
    out_block = (1, 1) + tuple(out_sp[1:]) + (ck,)
    kernel = partial(kern, nsp=nsp, c=c, ck=ck, g_sp=g_sp)
    return pl.pallas_call(
        kernel,
        grid=(n, n_planes, nchunks),
        in_specs=[
            pl.BlockSpec(in_block, lo_map, memory_space=pltpu.VMEM),
            pl.BlockSpec(in_block, hi_map, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            out_block,
            lambda nn, i, kc: (nn, i, *([0] * (nsp - 1)), kc),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n,) + out_sp + (fc,), x.dtype),
        interpret=interpret,
    )(x, x)


def _use_pallas(x: Array) -> bool:
    # Benchmark-gated OFF by default (round-3 on-TPU A/B, PARITY.md):
    # isolated the kernel beats the XLA slice/concat ~2.5x (1.9 ms vs
    # 4.8 ms at 72^3 x 256ch bf16), but the full 144^3 train step runs
    # 377 ms with it vs 333 ms pure-XLA — the custom call is an
    # optimization barrier where XLA otherwise fuses the shift into its
    # neighbors. utils/flags.py::shift_pack (env HDF_SHIFT_PACK, read
    # once at import; honored by SemanticSeg/CLI unless the config sets
    # shift_pack explicitly) = "pallas" to re-evaluate.
    from hdenseformer_tpu.utils.flags import shift_pack_mode

    if shift_pack_mode() != "pallas":
        return False
    nsp = x.ndim - 2
    if nsp not in (2, 3):
        return False
    if jax.default_backend() != "tpu":
        return False
    if _chunking(x.shape[-1], nsp) is None:
        return False
    # VMEM budget: (2 in + 1 out) double-buffered blocks of one spatial
    # plane x 128 lanes must fit the ~16 MB scoped-vmem limit (output
    # plane is one cell larger per inner dim; approximate with +1).
    inner = 1
    for i, s in enumerate(x.shape[2:-1]):
        s = s + 1
        inner *= (s + 7) // 8 * 8 if i == len(x.shape[2:-1]) - 1 else s
    block = inner * 128 * x.dtype.itemsize
    return 6 * block < 12 * 1024 * 1024


@jax.custom_vjp
def shift_pack(xp: Array) -> Array:
    """Half-shift gather (see module docstring); linear, residual-free."""
    if _use_pallas(xp):
        return _pallas_shift(xp, forward=True)
    return shift_pack_xla(xp)


def _shift_pack_fwd(xp):
    return shift_pack(xp), None


def _shift_pack_bwd(_, dxs):
    if _use_pallas(dxs):
        return (_pallas_shift(dxs, forward=False),)
    return (shift_unpack_xla(dxs),)


shift_pack.defvjp(_shift_pack_fwd, _shift_pack_bwd)

"""Shape-static resize / pooling primitives with PyTorch-compatible semantics.

The reference relies on ``F.interpolate`` in several load-bearing places
(deep-supervision target pyramid loss/combine_loss.py:76, transformer token
re-gridding models/HDenseFormer.py:145, decoder upsampling
models/HDenseFormer.py:174, sliding-window patch re-expansion
trainer.py:561-563). Exact index math matters for parity, so these are
implemented explicitly instead of trusting any library default:

- ``resize_nearest``: torch 'nearest' picks ``src = floor(dst * in/out)``
  (asymmetric, no half-pixel shift).
- ``resize_linear``/``upsample_linear``: torch bi/trilinear with
  ``align_corners=False`` uses half-pixel centers
  ``src = (dst + 0.5) * in/out - 0.5`` and no antialiasing, which is what
  ``jax.image.resize(method='linear', antialias=False)`` computes.

All functions are channels-last: ``x`` has shape ``(N, *spatial, C)`` and
``size`` addresses only the spatial dims. Everything is jit-safe with
static shapes.
"""
from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _check_spatial(x: jax.Array, size: Sequence[int]) -> tuple[int, ...]:
    size = tuple(int(s) for s in size)
    if len(size) != x.ndim - 2:
        raise ValueError(
            f"size {size} must have {x.ndim - 2} spatial dims for input of rank {x.ndim}"
        )
    return size


def resize_nearest(x: jax.Array, size: Sequence[int]) -> jax.Array:
    """Nearest-neighbor resize matching torch ``F.interpolate(mode='nearest')``.

    torch's nearest (the default mode used for deep-supervision target
    shrinking, loss/combine_loss.py:76) maps output index i to input index
    ``floor(i * in_size / out_size)``. We gather along each spatial axis.
    """
    size = _check_spatial(x, size)
    for axis, out_len in enumerate(size):
        in_len = x.shape[axis + 1]
        if in_len == out_len:
            continue
        if in_len % out_len == 0:
            # integer shrink ratio r: floor(i*r) == i*r — a strided slice.
            # (jnp.take's gather lowering costs full-tensor relayout copies
            # on TPU: ~6.7 ms/step on the 144^3 DS label pyramid, r4 trace)
            r = in_len // out_len
            idx = [slice(None)] * x.ndim
            idx[axis + 1] = slice(0, in_len, r)
            x = x[tuple(idx)]
            continue
        idx = np.floor(np.arange(out_len) * (in_len / out_len)).astype(np.int32)
        idx = np.minimum(idx, in_len - 1)
        x = jnp.take(x, jnp.asarray(idx), axis=axis + 1)
    return x


def _halfpixel_matrix(in_len: int, out_len: int) -> np.ndarray:
    """(out,in) linear-interp matrix with half-pixel centers (torch
    align_corners=False): src = (dst + 0.5) * in/out - 0.5, edge-clamped."""
    src = (np.arange(out_len, dtype=np.float64) + 0.5) * (in_len / out_len) - 0.5
    src = np.clip(src, 0.0, in_len - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, in_len - 1)
    frac = src - lo
    A = np.zeros((out_len, in_len), np.float32)
    A[np.arange(out_len), lo] += (1.0 - frac).astype(np.float32)
    A[np.arange(out_len), hi] += frac.astype(np.float32)
    return A


def resize_linear_matrix(x: jax.Array, size: Sequence[int]) -> jax.Array:
    """Half-pixel linear resize as per-axis dense interpolation matmuls.

    Identical math to ``resize_linear`` but lowered as (out,in) matmuls per
    spatial axis, which ride the MXU instead of gather units — preferable
    on TPU for the x2 upsampling chains.
    """
    size = _check_spatial(x, size)
    for axis, out_len in enumerate(size):
        in_len = x.shape[axis + 1]
        if in_len == out_len:
            continue
        A = jnp.asarray(_halfpixel_matrix(in_len, out_len), x.dtype)
        x = jnp.moveaxis(
            jnp.tensordot(A, x, axes=[[1], [axis + 1]]), 0, axis + 1
        )
    return x


def resize_linear(
    x: jax.Array, size: Sequence[int], use_matrix: bool | None = None
) -> jax.Array:
    """Bi/trilinear resize matching torch ``align_corners=False`` semantics.

    On TPU the matmul lowering (``resize_linear_matrix``) is used by
    default; elsewhere ``jax.image.resize``. Both compute the same values.
    """
    size = _check_spatial(x, size)
    out_shape = (x.shape[0],) + size + (x.shape[-1],)
    if out_shape == x.shape:
        return x
    if use_matrix is None:
        use_matrix = jax.default_backend() == "tpu"
    if use_matrix:
        return resize_linear_matrix(x, size)
    return jax.image.resize(x, out_shape, method="linear", antialias=False)


def upsample_linear(x: jax.Array, scale: int | Sequence[int]) -> jax.Array:
    """``F.interpolate(scale_factor=scale, mode='*linear', align_corners=False)``."""
    nsp = x.ndim - 2
    if isinstance(scale, int):
        scale = (scale,) * nsp
    size = tuple(int(x.shape[i + 1] * s) for i, s in enumerate(scale))
    return resize_linear(x, size)


def resize_linear_align_corners(x: jax.Array, size: Sequence[int]) -> jax.Array:
    """Bi/trilinear resize with torch ``align_corners=True`` semantics.

    src = dst * (in-1)/(out-1). Implemented as per-axis dense interpolation
    matrices (an (out,in) matmul per spatial axis) — exact, and the matmuls
    ride the MXU instead of gather units.
    """
    size = _check_spatial(x, size)
    for axis, out_len in enumerate(size):
        in_len = x.shape[axis + 1]
        if in_len == out_len:
            continue
        if out_len == 1 or in_len == 1:
            src = np.zeros((out_len,), np.float64)
        else:
            src = np.arange(out_len, dtype=np.float64) * (in_len - 1) / (out_len - 1)
        lo = np.clip(np.floor(src).astype(np.int64), 0, in_len - 1)
        hi = np.clip(lo + 1, 0, in_len - 1)
        frac = src - lo
        A = np.zeros((out_len, in_len), np.float32)
        A[np.arange(out_len), lo] += (1.0 - frac).astype(np.float32)
        A[np.arange(out_len), hi] += frac.astype(np.float32)
        x = jnp.tensordot(jnp.asarray(A), x, axes=[[1], [axis + 1]])
        x = jnp.moveaxis(x, 0, axis + 1)
    return x


def upsample_linear_align_corners(x: jax.Array, scale: int | Sequence[int]) -> jax.Array:
    nsp = x.ndim - 2
    if isinstance(scale, int):
        scale = (scale,) * nsp
    size = tuple(int(x.shape[i + 1] * s) for i, s in enumerate(scale))
    return resize_linear_align_corners(x, size)


def _window_split(x: jax.Array, window: int):
    """Trim odd remainders (torch VALID floor semantics) and reshape to
    [B, o1, w, o2, w, ..., C] with per-dim window axes."""
    spatial = x.shape[1:-1]
    trimmed = [s - s % window for s in spatial]
    if any(t != s for t, s in zip(trimmed, spatial)):
        x = x[(slice(None),) + tuple(slice(0, t) for t in trimmed) + (slice(None),)]
    shape = [x.shape[0]]
    for t in trimmed:
        shape += [t // window, window]
    shape.append(x.shape[-1])
    return x.reshape(shape)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def _max_pool_ws(x: jax.Array, window: int) -> jax.Array:
    nsp = x.ndim - 2
    xs = _window_split(x, window)
    return jnp.max(xs, axis=tuple(range(2, 2 + 2 * nsp, 2)))


def _max_pool_ws_fwd(x, window):
    y = _max_pool_ws(x, window)
    return y, (x, y)


def _max_pool_ws_bwd(window, res, dy):
    # torch (and XLA select-and-scatter) route the gradient to the FIRST
    # max in flat row-major window order on ties — ties are ubiquitous
    # after ReLU, so "all ties share dy" (jnp.max's native VJP) diverges
    # from torch gradients. Move the window axes to one contiguous flat
    # axis (a lane-preserving permutation: C stays minor) and take the
    # first tie by cumulative count along it.
    x, y = res
    nsp = x.ndim - 2
    xs = _window_split(x, window)  # [B, o1, w, o2, w, ..., C]
    perm = ([0] + [1 + 2 * i for i in range(nsp)]
            + [2 + 2 * i for i in range(nsp)] + [xs.ndim - 1])
    xt = xs.transpose(perm)  # [B, o1..onsp, w..w, C]
    osp = xt.shape[1:1 + nsp]
    xf = xt.reshape((x.shape[0],) + osp + (window**nsp, x.shape[-1]))
    mask = xf == y[..., None, :]
    # first tie in flat window order == argmax(mask): jnp.argmax returns
    # the FIRST maximal element. The earlier cumsum(mask.astype(int32))
    # formulation lowered as an s32 prefix-sum reduce-window over the
    # full [B, *osp, w^nsp, C] tensor — 21.4 + 3.9 ms/step at 144^3 in
    # the round-5 trace, the single largest non-conv op in the step;
    # argmax + an iota compare is one reduce plus an elementwise pass.
    idx = jnp.argmax(mask, axis=-2)  # [B, *osp, C] int32
    win_iota = jnp.arange(window**nsp, dtype=idx.dtype).reshape(
        (window**nsp, 1)
    )
    sel = win_iota == idx[..., None, :]
    dxf = jnp.where(sel, dy[..., None, :], jnp.zeros((), dy.dtype))
    # invert: flat window axis -> per-dim window axes -> spatial
    dxt = dxf.reshape((x.shape[0],) + osp + (window,) * nsp + (x.shape[-1],))
    dxs = dxt.transpose(np.argsort(perm))
    dx = dxs.reshape([x.shape[0]] + [s - s % window for s in x.shape[1:-1]]
                     + [x.shape[-1]])
    pads = [(0, 0)] + [(0, s % window) for s in x.shape[1:-1]] + [(0, 0)]
    if any(p[1] for p in pads):
        dx = jnp.pad(dx, pads)
    return (dx,)


_max_pool_ws.defvjp(_max_pool_ws_fwd, _max_pool_ws_bwd)


def max_pool(
    x: jax.Array, window: int = 2, stride: int = 2, mode: str | None = None
) -> jax.Array:
    """MaxPool over all spatial dims (torch ``MaxPool2d/3d(k, s)``).

    For the ubiquitous window == stride case this is a reshape +
    ``jnp.max`` over the window axes instead of ``lax.reduce_window``:
    on TPU reduce_window (and its select-and-scatter backward) forces
    bf16 operands into T(2,128) layouts, paying full-tensor relayout
    copies on both sides (~10 ms/step across the 144^3 encoder, r4
    trace); the reshape form stays in the producer's T(8,128) layout.
    The custom VJP keeps torch's first-tie gradient routing (see
    ``_max_pool_ws_bwd``). VALID semantics: odd remainders are sliced
    off first (floor division, as torch does). ``mode`` overrides the
    global A/B knob per call site (``utils/flags.py::set_max_pool``,
    "reshape" default) — models whose recorded A/B favors the other
    lowering pin it explicitly (DAUNet: reduce_window, PARITY.md r4).
    """
    from hdenseformer_tpu.utils.flags import max_pool_mode

    nsp = x.ndim - 2
    if mode is None:
        mode = max_pool_mode()
    assert mode in ("reshape", "reduce_window"), mode
    if window == stride and mode == "reshape":
        return _max_pool_ws(x, window)
    dims = (1,) + (window,) * nsp + (1,)
    strides = (1,) + (stride,) * nsp + (1,)
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, dims, strides, padding="VALID"
    )


def avg_pool(x: jax.Array, window: int, stride: int | None = None) -> jax.Array:
    """AvgPool over all spatial dims (torch ``AvgPool2d/3d(k, s)``)."""
    nsp = x.ndim - 2
    stride = window if stride is None else stride
    dims = (1,) + (window,) * nsp + (1,)
    strides = (1,) + (stride,) * nsp + (1,)
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, dims, strides, padding="VALID"
    )
    return summed / float(window**nsp)


def global_avg_pool(x: jax.Array, keepdims: bool = True) -> jax.Array:
    """AdaptiveAvgPool to 1 over all spatial dims."""
    axes = tuple(range(1, x.ndim - 1))
    return jnp.mean(x, axis=axes, keepdims=keepdims)

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


def max_pool(x: jax.Array, window: int = 2, stride: int = 2) -> jax.Array:
    """MaxPool over all spatial dims (torch ``MaxPool2d/3d(k, s)``)."""
    nsp = x.ndim - 2
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

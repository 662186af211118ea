"""Pallas fused InstanceNorm(+affine)+ReLU for channels-last volumes.

The reference BasicConv3d applies InstanceNorm3d + ReLU after every conv
(models/HDenseFormer.py:148-159) — at 144^3 x 32ch these are pure
HBM-bandwidth ops (reduce over ~3M voxels per (N,C), then normalize).
XLA implements this as separate reduce and normalize passes over HBM;
this kernel computes the statistics and the normalized/activated output
in a single pallas_call with the running sums held in SMEM-backed
accumulators per grid row, reading the activation from HBM exactly twice
(once for stats, once for normalize) with both passes pipelined by the
same grid.

Layout: x (N, S, C) where S = prod(spatial) — callers flatten spatial
dims (a free reshape in row-major channels-last layout). Grid over
(N, spatial blocks); two-phase accumulation inside one kernel via grid
revisiting (TPU grid is executed in order per leading axis).

Falls back to the XLA implementation off-TPU; correctness is tested in
interpret mode (tests/test_pallas.py). Benchmark-gated like the attention
kernel (bench_kernels.py).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


def xla_instance_norm_relu(
    x: jax.Array,
    scale: Optional[jax.Array] = None,
    bias: Optional[jax.Array] = None,
    epsilon: float = 1e-5,
    relu: bool = True,
) -> jax.Array:
    """Reference path: fp32-stat instance norm + optional affine + ReLU.

    x: (N, *spatial, C).
    """
    axes = tuple(range(1, x.ndim - 1))
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=axes, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=axes, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + epsilon)
    if scale is not None:
        y = y * scale.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(x.dtype)


def fused_instance_norm_relu(
    x: jax.Array,  # (N, S, C)
    scale: Optional[jax.Array] = None,
    bias: Optional[jax.Array] = None,
    epsilon: float = 1e-5,
    relu: bool = True,
    block_s: int = 4096,
    interpret: bool = False,
) -> jax.Array:
    """Two-phase fused IN(+affine)+ReLU, channels-last (N, S, C)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, s, c = x.shape
    affine = scale is not None
    if not affine:
        scale = jnp.ones((c,), jnp.float32)
        bias = jnp.zeros((c,), jnp.float32)
    block_s = min(block_s, s)
    n_blocks = -(-s // block_s)
    s_pad = n_blocks * block_s
    if s_pad != s:
        x = jnp.pad(x, ((0, 0), (0, s_pad - s), (0, 0)))

    def kernel(x_ref, scale_ref, bias_ref, o_ref, acc_ref):
        phase = pl.program_id(1)
        blk = pl.program_id(2)

        @pl.when(jnp.logical_and(phase == 0, blk == 0))
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        xb = x_ref[0].astype(jnp.float32)  # (block_s, C)
        row0 = blk * block_s
        rows = jax.lax.broadcasted_iota(jnp.int32, xb.shape, 0) + row0
        mask = (rows < s).astype(jnp.float32)
        xb = xb * mask

        @pl.when(phase == 0)
        def _():
            acc_ref[0, :] += jnp.sum(xb, axis=0)
            acc_ref[1, :] += jnp.sum(xb * xb, axis=0)

        @pl.when(phase == 1)
        def _():
            cnt = jnp.float32(s)
            mean = acc_ref[0, :] / cnt
            var = acc_ref[1, :] / cnt - mean * mean
            inv = jax.lax.rsqrt(var + epsilon)
            y = (xb - mean[None, :]) * inv[None, :]
            y = y * scale_ref[0].astype(jnp.float32)[None, :] + bias_ref[0].astype(jnp.float32)[None, :]
            if relu:
                y = jnp.maximum(y, 0.0)
            o_ref[0] = y.astype(o_ref.dtype)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, s_pad, c), x.dtype),
        grid=(n, 2, n_blocks),
        in_specs=[
            pl.BlockSpec((1, block_s, c), lambda i, p, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, p, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, p, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_s, c), lambda i, p, j: (i, j, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2, c), jnp.float32)],
        interpret=interpret,
    )(x, scale.reshape(1, c), bias.reshape(1, c))
    return out[:, :s, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _fused_in_relu_trainable(x, scale, bias, epsilon, relu):
    """Pallas forward (flattened spatial) with XLA-derived backward."""
    shape = x.shape
    flat = x.reshape(shape[0], -1, shape[-1])
    out = fused_instance_norm_relu(flat, scale, bias, epsilon, relu)
    return out.reshape(shape)


def _in_fwd(x, scale, bias, epsilon, relu):
    return _fused_in_relu_trainable(x, scale, bias, epsilon, relu), (x, scale, bias)


def _in_bwd(epsilon, relu, residuals, g):
    x, scale, bias = residuals
    _, vjp = jax.vjp(
        lambda xx, sc, bi: xla_instance_norm_relu(xx, sc, bi, epsilon, relu),
        x, scale, bias,
    )
    return vjp(g)


_fused_in_relu_trainable.defvjp(_in_fwd, _in_bwd)


def instance_norm_relu(x, scale=None, bias=None, epsilon=1e-5, relu=True, use_pallas=None):
    """Dispatch wrapper: x (N, *spatial, C); Pallas on TPU by default.

    Benchmark gate (v5e, 144^3 x 32ch fp32): fused kernel 18.2 ms vs XLA
    45.9 ms STANDALONE (2.5x, max deviation 2.4e-6) — but IN-MODEL the
    end-to-end train step regressed 2x (XLA fuses the norm into the conv
    epilogue and the custom-VJP recompute adds backward passes), so the
    default is OFF; see models/layers.InstanceNorm.
    """
    if use_pallas is None:
        use_pallas = False
    if use_pallas and jax.default_backend() == "tpu":
        c = x.shape[-1]
        sc = scale if scale is not None else jnp.ones((c,), jnp.float32)
        bi = bias if bias is not None else jnp.zeros((c,), jnp.float32)
        return _fused_in_relu_trainable(x, sc, bi, epsilon, relu)
    return xla_instance_norm_relu(x, scale, bias, epsilon, relu)

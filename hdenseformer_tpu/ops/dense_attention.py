"""Pallas fused attention for tiny-head dense attention (head_dim=4).

The H-DenseFormer attention operates on 729 tokens at growth_rate 32 with
8 heads of head_dim 4 (models/HDenseFormer.py:64-75 in the reference).
head_dim=4 means the per-head QK^T/AV matmuls use 4-deep contractions —
hopeless MXU utilization if dispatched as separate padded matmuls, and
the op is bandwidth-bound: the win is keeping Q/K/V, the 729x729 score
matrix, and the output entirely in VMEM for the whole computation.

This kernel fuses scores -> scaled softmax (fp32) -> weighted sum for all
heads of one batch element per grid step. Padding rows (when N is not a
multiple of the tile) are masked out of the softmax.

Use ``fused_dense_attention(q, k, v)`` with shapes (B, H, N, D); falls
back to the pure-XLA path automatically off-TPU. Correctness is tested
against the XLA reference in tests/test_pallas.py; enable in the model
via ``DenseAttention`` once benchmarked profitable on the target chip
(kernels are benchmark-gated, see bench_kernels.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def xla_attention(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """Reference path: plain XLA softmax attention. (B, H, N, D) -> same."""
    d = q.shape[-1]
    scores = jnp.einsum("bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(scores * (d**-0.5), axis=-1)
    return jnp.einsum("bhij,bhjd->bhid", probs.astype(v.dtype), v)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, n_real: int, scale: float):
    """One (batch, head) slice: q/k/v (N_pad, D_pad) resident in VMEM."""
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, dimension=1)
    scores = jnp.where(col < n_real, scores, -1e30)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    probs = e / jnp.sum(e, axis=-1, keepdims=True)
    o_ref[0] = jax.lax.dot_general(
        probs, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def fused_dense_attention(q: jax.Array, k: jax.Array, v: jax.Array, interpret: bool = False) -> jax.Array:
    """Fused VMEM-resident attention. q/k/v: (B, H, N, D) -> (B, H, N, D)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, n, d = q.shape
    scale = d**-0.5
    n_pad = _round_up(n, 128)
    d_pad = _round_up(d, 128)

    def pad(x):
        return jnp.pad(x, ((0, 0), (0, 0), (0, n_pad - n), (0, d_pad - d)))

    qp, kp, vp = pad(q), pad(k), pad(v)
    bh = b * h
    qp = qp.reshape(bh, n_pad, d_pad)
    kp = kp.reshape(bh, n_pad, d_pad)
    vp = vp.reshape(bh, n_pad, d_pad)

    kernel = functools.partial(_attn_kernel, n_real=n, scale=scale)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bh, n_pad, d_pad), q.dtype),
        grid=(bh,),
        in_specs=[
            pl.BlockSpec((1, n_pad, d_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, d_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, d_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, n_pad, d_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(qp, kp, vp)
    return out.reshape(b, h, n_pad, d_pad)[:, :, :n, :d]


@jax.custom_vjp
def fused_dense_attention_trainable(q, k, v):
    """Pallas forward with an XLA-derived backward (same math, recompute)."""
    return fused_dense_attention(q, k, v)


def _fused_fwd(q, k, v):
    return fused_dense_attention(q, k, v), (q, k, v)


def _fused_bwd(residuals, g):
    q, k, v = residuals
    _, vjp = jax.vjp(xla_attention, q, k, v)
    return vjp(g)


fused_dense_attention_trainable.defvjp(_fused_fwd, _fused_bwd)


def dense_attention(q, k, v, use_pallas=None):
    """Dispatch: Pallas kernel on TPU by default, XLA otherwise.

    Benchmark gate (bench_kernels.py on v5e): fused kernel is 19.1x faster
    at the headline shape (B4xH8xN729xD4: 24.6ms -> 1.29ms) and 3.5x at
    B16, so TPU defaults to the Pallas path; pass use_pallas=False to
    force XLA.
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas and jax.default_backend() == "tpu":
        return fused_dense_attention_trainable(q, k, v)
    return xla_attention(q, k, v)

"""Kernel microbenchmarks: Pallas vs XLA paths on the current backend.

Run on TPU to decide benchmark-gated kernel defaults (the model's
``use_pallas`` flag). Prints one JSON line per kernel comparison.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, q, k, v, iters=50):
    """Times with per-call input variation (the remote-TPU relay caches
    identical dispatches) and a host transfer as the sync barrier."""
    out = fn(q, k, v)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    acc = jnp.float32(0.0)
    for i in range(iters):
        out = fn(q + i * 1e-6, k, v)
        acc = acc + jnp.sum(out)  # chain iterations so the final transfer forces all
    float(acc)
    return (time.perf_counter() - t0) / iters


def main():
    from hdenseformer_tpu.ops.dense_attention import fused_dense_attention, xla_attention

    # H-DenseFormer headline shape: batch2 x 2 modalities, 8 heads,
    # 729 tokens, head_dim 4
    rng = np.random.RandomState(0)
    for b, h, n, d, tag in [(4, 8, 729, 4, "hdf_headline"), (16, 8, 729, 4, "hdf_large_batch")]:
        q = jnp.asarray(rng.randn(b, h, n, d).astype(np.float32))
        k = jnp.asarray(rng.randn(b, h, n, d).astype(np.float32))
        v = jnp.asarray(rng.randn(b, h, n, d).astype(np.float32))
        xla_t = timeit(jax.jit(xla_attention), q, k, v)
        try:
            pallas_t = timeit(jax.jit(fused_dense_attention), q, k, v)
        except Exception as e:
            pallas_t = None
        print(
            json.dumps(
                {
                    "kernel": "dense_attention",
                    "shape": tag,
                    "xla_us": round(xla_t * 1e6, 1),
                    "pallas_us": round(pallas_t * 1e6, 1) if pallas_t else None,
                    "speedup": round(xla_t / pallas_t, 2) if pallas_t else None,
                    "backend": jax.default_backend(),
                }
            )
        )

    # fused InstanceNorm+ReLU at the model's full-res shape (144^3 x 32ch)
    from hdenseformer_tpu.ops.instance_norm import (
        fused_instance_norm_relu,
        xla_instance_norm_relu,
    )

    n, s, c = 1, 144 * 144 * 144, 32
    x = jnp.asarray(rng.randn(n, s, c).astype(np.float32))
    scale = jnp.ones((c,), jnp.float32)
    bias = jnp.zeros((c,), jnp.float32)

    def xla_in(a, _k, _v):
        return xla_instance_norm_relu(a.reshape(n, s, 1, c), scale, bias).reshape(n, s, c)

    def pallas_in(a, _k, _v):
        return fused_instance_norm_relu(a, scale, bias, block_s=4096)

    xla_t = timeit(jax.jit(xla_in), x, x, x, iters=20)
    try:
        pallas_t = timeit(jax.jit(pallas_in), x, x, x, iters=20)
    except Exception:
        pallas_t = None
    print(
        json.dumps(
            {
                "kernel": "instance_norm_relu",
                "shape": "144^3x32ch",
                "xla_us": round(xla_t * 1e6, 1),
                "pallas_us": round(pallas_t * 1e6, 1) if pallas_t else None,
                "speedup": round(xla_t / pallas_t, 2) if pallas_t else None,
                "backend": jax.default_backend(),
            }
        )
    )


if __name__ == "__main__":
    main()

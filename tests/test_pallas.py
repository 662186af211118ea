"""Pallas kernels: correctness vs XLA reference (interpret mode on CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hdenseformer_tpu.ops.dense_attention import fused_dense_attention, xla_attention


@pytest.mark.parametrize("n,d", [(729, 4), (64, 4), (100, 8)])
def test_fused_attention_matches_xla(rng, n, d):
    b, h = 2, 8
    q = jnp.asarray(rng.randn(b, h, n, d).astype(np.float32))
    k = jnp.asarray(rng.randn(b, h, n, d).astype(np.float32))
    v = jnp.asarray(rng.randn(b, h, n, d).astype(np.float32))
    ref = np.asarray(xla_attention(q, k, v))
    got = np.asarray(fused_dense_attention(q, k, v, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_fused_attention_no_nan_on_padding(rng):
    # n=729 pads to 768: padded query rows must not poison real outputs
    q = jnp.asarray(rng.randn(1, 2, 130, 4).astype(np.float32))
    k = jnp.asarray(rng.randn(1, 2, 130, 4).astype(np.float32))
    v = jnp.asarray(rng.randn(1, 2, 130, 4).astype(np.float32))
    got = np.asarray(fused_dense_attention(q, k, v, interpret=True))
    assert np.isfinite(got).all()


# ---------------------------------------------------------------------------
# fused InstanceNorm + ReLU
# ---------------------------------------------------------------------------

from hdenseformer_tpu.ops.instance_norm import (  # noqa: E402
    fused_instance_norm_relu,
    xla_instance_norm_relu,
)


@pytest.mark.parametrize("n,s,c,bs", [(2, 1000, 32, 256), (1, 300, 16, 128), (2, 512, 64, 512)])
def test_fused_instance_norm_matches_xla(rng, n, s, c, bs):
    x = jnp.asarray(rng.randn(n, s, c).astype(np.float32) * 3 + 1)
    scale = jnp.asarray(rng.rand(c).astype(np.float32))
    bias = jnp.asarray(rng.randn(c).astype(np.float32))
    ref = np.asarray(
        xla_instance_norm_relu(x.reshape(n, s, 1, c), scale, bias).reshape(n, s, c)
    )
    got = np.asarray(
        fused_instance_norm_relu(x, scale, bias, block_s=bs, interpret=True)
    )
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_fused_instance_norm_no_affine(rng):
    x = jnp.asarray(rng.randn(1, 500, 8).astype(np.float32))
    ref = np.asarray(xla_instance_norm_relu(x.reshape(1, 500, 1, 8)).reshape(1, 500, 8))
    got = np.asarray(fused_instance_norm_relu(x, block_s=128, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)

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

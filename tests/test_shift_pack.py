"""Tests for ops/shift_pack.py — the residual-free half-shift custom_vjp.

The op re-expresses ``ops/s2d.plain_to_shifted`` (reference fine-grid SAME
conv input halo, /root/reference/models/HDenseFormer.py:148-158 convs) as a
linear bijection with a hand-written transpose. Ground truth everywhere is
the XLA slice/concat implementation the s2d suite already validates against
fine-grid convs.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hdenseformer_tpu.ops.s2d import pack, plain_to_shifted
from hdenseformer_tpu.ops.shift_pack import (
    _chunking,
    _pallas_shift,
    shift_pack,
    shift_pack_xla,
    shift_unpack_xla,
)

rng = np.random.default_rng(7)


SHAPES = [
    ((2, 5, 6, 7, 32 * 8), 3),  # level-0 channel count, odd grid
    ((1, 4, 4, 4, 128), 3),  # exactly one lane chunk
    ((2, 9, 9, 16 * 4), 2),  # 2D
]


def test_shift_unpack_is_transpose_of_shift_pack():
    """<S x, y> == <x, S^T y> for random x, y — exact linearity check."""
    for shape, _ in SHAPES:
        x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        sx = shift_pack_xla(x)
        y = jnp.asarray(rng.standard_normal(sx.shape), jnp.float32)
        lhs = jnp.vdot(sx, y)
        rhs = jnp.vdot(x, shift_unpack_xla(y))
        np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-5)


def test_custom_vjp_matches_autodiff_of_xla_path():
    x = jnp.asarray(rng.standard_normal((1, 4, 5, 6, 64)), jnp.float32)

    def f_custom(v):
        return jnp.sum(jnp.sin(shift_pack(v)))

    def f_ref(v):
        return jnp.sum(jnp.sin(plain_to_shifted(v)))

    np.testing.assert_allclose(
        np.asarray(jax.grad(f_custom)(x)),
        np.asarray(jax.grad(f_ref)(x)),
        rtol=1e-6,
    )


@pytest.mark.parametrize("shape,nsp", SHAPES)
def test_pallas_interpret_fwd_bwd_exact(shape, nsp):
    """Interpret-mode kernel is bit-identical to the XLA path."""
    if _chunking(shape[-1], nsp) is None:
        pytest.skip("unsupported chunking")
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    ref = shift_pack_xla(x)
    got = _pallas_shift(x, True, interpret=True)
    assert np.array_equal(np.asarray(ref), np.asarray(got))
    d = jnp.asarray(rng.standard_normal(ref.shape), jnp.float32)
    refb = shift_unpack_xla(d)
    gotb = _pallas_shift(d, False, interpret=True)
    assert np.array_equal(np.asarray(refb), np.asarray(gotb))


def test_chunking_rules():
    # 256 = 2 chunks of 128
    assert _chunking(256, 3) == (32, 128, 2)
    assert _chunking(128, 3) == (16, 128, 1)
    # non-multiples of 128 fall back to XLA (lane padding would waste
    # up to 8x VMEM in the kernel blocks)
    assert _chunking(48, 2) is None
    assert _chunking(16, 3) is None
    assert _chunking(192, 3) is None


def test_packed_roundtrip_consistency():
    """shift on pack(x) still matches plain_to_shifted(pack(x))."""
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 8, 24)), jnp.float32)
    xp = pack(x)
    np.testing.assert_array_equal(
        np.asarray(shift_pack(xp)), np.asarray(plain_to_shifted(xp))
    )

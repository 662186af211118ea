"""Device-side augmentation: semantics parity vs host ops, jit/batch safety."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hdenseformer_tpu.data.augment_jax import (
    augment_batch_3d,
    pet_ct_normalize,
    random_affine_3d,
    random_crop,
    random_flip,
    random_gamma,
    random_noise,
    to_onehot,
)
from hdenseformer_tpu.data.transforms import PETandCTNormalize


def test_pet_ct_normalize_matches_host(rng):
    img = rng.randn(2, 8, 8, 8, 2).astype(np.float32) * 500
    got = np.asarray(pet_ct_normalize(jnp.asarray(img)))
    for b in range(2):
        host = PETandCTNormalize()(
            {"image": np.moveaxis(img[b], -1, 0).copy(), "label": np.zeros((8, 8, 8))}
        )["image"]
        np.testing.assert_allclose(got[b], np.moveaxis(host, 0, -1), rtol=1e-5, atol=1e-5)


def test_to_onehot_complement():
    lab = jnp.asarray(np.array([[[0, 1], [2, 0]]], np.int32))
    oh = np.asarray(to_onehot(lab, 3))
    assert oh.shape == (1, 2, 2, 3)
    np.testing.assert_array_equal(oh.sum(-1), 1)
    assert oh[0, 0, 1, 1] == 1 and oh[0, 1, 0, 2] == 1


def test_random_crop_shapes_and_content(rng):
    img = jnp.asarray(rng.rand(2, 12, 12, 12, 2).astype(np.float32))
    lab = jnp.asarray(rng.randint(0, 2, (2, 12, 12, 12)).astype(np.float32))
    ic, lc = random_crop(jax.random.PRNGKey(0), img, lab, (8, 8, 8))
    assert ic.shape == (2, 8, 8, 8, 2)
    assert lc.shape == (2, 8, 8, 8)


def test_random_flip_applies_one_axis(rng):
    img = jnp.asarray(np.arange(2 * 4 * 4 * 1, dtype=np.float32).reshape(2, 4, 4, 1))
    lab = jnp.asarray(np.arange(2 * 4 * 4, dtype=np.float32).reshape(2, 4, 4))
    i2, l2 = random_flip(jax.random.PRNGKey(0), img, lab)
    for b in range(2):
        a = np.asarray(i2[b, :, :, 0])
        orig = np.asarray(img[b, :, :, 0])
        assert (
            np.array_equal(a, orig[::-1]) or np.array_equal(a, orig[:, ::-1])
        )
        np.testing.assert_array_equal(np.asarray(l2[b]), a)


def test_random_affine_preserves_shape_and_classes(rng):
    img = jnp.asarray(rng.rand(1, 10, 10, 10, 2).astype(np.float32))
    lab_np = np.zeros((1, 10, 10, 10), np.float32)
    lab_np[0, 3:7, 3:7, 3:7] = 1
    ia, la = random_affine_3d(jax.random.PRNGKey(1), img, jnp.asarray(lab_np))
    assert ia.shape == img.shape
    assert set(np.unique(np.asarray(la))) <= {0.0, 1.0}
    # foreground roughly preserved under small warps
    assert 20 < np.asarray(la).sum() < 120


def test_random_gamma_range(rng):
    img = jnp.asarray(rng.rand(3, 8, 8, 1).astype(np.float32))
    out = np.asarray(random_gamma(jax.random.PRNGKey(0), img))
    assert out.shape == img.shape
    assert (out >= 0).all() and (out <= 1.0 + 1e-6).all()


def test_random_noise_probability():
    img = jnp.zeros((64, 8, 8, 1)) + 0.5
    out = np.asarray(random_noise(jax.random.PRNGKey(0), img))
    changed = np.any(out != 0.5, axis=(1, 2, 3))
    # p = 0.1: expect some but not most samples changed
    assert 0 < changed.sum() < 32


def test_full_pipeline_jits(rng):
    img = jnp.asarray(rng.rand(2, 12, 12, 12, 2).astype(np.float32) * 100)
    lab = jnp.asarray(rng.randint(0, 2, (2, 12, 12, 12)).astype(np.float32))
    im, oh = augment_batch_3d(jax.random.PRNGKey(0), img, lab, (8, 8, 8))
    assert im.shape == (2, 8, 8, 8, 2)
    assert oh.shape == (2, 8, 8, 8, 2)
    assert np.isfinite(np.asarray(im)).all()
    # deterministic per key
    im2, _ = augment_batch_3d(jax.random.PRNGKey(0), img, lab, (8, 8, 8))
    np.testing.assert_array_equal(np.asarray(im), np.asarray(im2))

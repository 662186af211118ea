"""Device-side (jit-compiled, batched) augmentation transforms.

The north-star TPU design calls for the augmentation stack to be
expressible as batched XLA transforms (SURVEY.md §2.2, BASELINE.json) so
augmentation can run on-device, overlapped with the input pipeline,
instead of on host CPUs. These are key-threaded, statically-shaped,
batch-first equivalents of the host ops in augment3d.py / augment2d.py:

- ``random_crop``        : RandomCrop3D  (dynamic_slice at a random origin)
- ``random_flip``        : RandomFlip3D/2D ('hv' semantics)
- ``random_affine_3d``   : RandomTranslationRotationZoom3D (x-rotation,
  in-plane translation/zoom, trilinear map_coordinates, per-class 0.5
  label threshold)
- ``random_gamma``       : RandomAdjust2D
- ``random_noise``       : RandomNoise2D (p=0.1, sigma 0.1, clipped)
- ``pet_ct_normalize``   : PETandCTNormalize (pure function of the batch)
- ``to_onehot``          : To_Tensor's background-complement one-hot

All functions take ``(key, image, label)`` with image (B, *spatial, C) and
integer label (B, *spatial), and are safe under jit/vmap. Randomness is
jax PRNG; every op folds the key per batch element so augmentation is
independent per sample.
"""
from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def pet_ct_normalize(image: Array, mean: float = 0.0, w: float = 1024.0) -> Array:
    """Channel-0 CT clip/scale + channel-1 PET z-score, channels-last."""
    ct = (jnp.clip(image[..., 0], mean - w, mean + w) - mean) / w
    pet = image[..., 1]
    axes = tuple(range(1, pet.ndim))
    mu = jnp.mean(pet, axis=axes, keepdims=True)
    sd = jnp.std(pet, axis=axes, keepdims=True)
    pet = (pet - mu) / (sd + 1e-3)
    rest = image[..., 2:]
    return jnp.concatenate([ct[..., None], pet[..., None], rest], axis=-1)


def to_onehot(label: Array, num_classes: int) -> Array:
    """Background-as-complement one-hot (ref data_loader.py:146-151)."""
    onehot = jax.nn.one_hot(label.astype(jnp.int32), num_classes, dtype=jnp.float32)
    fg = jnp.max(onehot[..., 1:], axis=-1)
    return onehot.at[..., 0].set(1.0 - fg)


@partial(jax.jit, static_argnames=("patch",))
def random_crop(key: Array, image: Array, label: Array, patch: Tuple[int, ...]):
    """Per-sample random crop to ``patch`` (ref transformer_3d.py:7-42)."""
    nsp = len(patch)

    def one(key, img, lab):
        starts = []
        for i in range(nsp):
            key, sub = jax.random.split(key)
            hi = img.shape[i] - patch[i]
            starts.append(
                jax.random.randint(sub, (), 0, hi + 1) if hi > 0 else jnp.int32(0)
            )
        img_c = jax.lax.dynamic_slice(
            img, tuple(starts) + (0,), tuple(patch) + (img.shape[-1],)
        )
        lab_c = jax.lax.dynamic_slice(lab, tuple(starts), tuple(patch))
        return img_c, lab_c

    keys = jax.random.split(key, image.shape[0])
    return jax.vmap(one)(keys, image, label)


@jax.jit
def random_flip(key: Array, image: Array, label: Array):
    """'hv' flip: p=0.5 flip axis -2 (H) else flip axis -1 of the spatial dims.

    Matches RandomFlip3D('hv') (ref transformer_3d.py:143-152): exactly one
    of the two flips is applied per sample.
    """
    nsp = label.ndim - 1

    def one(key, img, lab):
        coin = jax.random.uniform(key) > 0.5
        h_ax_img, w_ax_img = nsp - 2, nsp - 1  # spatial axes in (sp..., C)
        img_f = jnp.where(coin, jnp.flip(img, axis=h_ax_img), jnp.flip(img, axis=w_ax_img))
        lab_f = jnp.where(coin, jnp.flip(lab, axis=h_ax_img), jnp.flip(lab, axis=w_ax_img))
        return img_f, lab_f

    keys = jax.random.split(key, image.shape[0])
    return jax.vmap(one)(keys, image, label)


@partial(jax.jit, static_argnames=("num_classes", "mode"))
def random_affine_3d(
    key: Array,
    image: Array,  # (B, D, H, W, C)
    label: Array,  # (B, D, H, W)
    num_classes: int = 2,
    mode: str = "tr",
):
    """Translation/rotation/zoom warp (ref transformer_3d.py:45-120).

    Same parameter ranges: in-plane translation U(-5,5) voxels, x-axis
    rotation U(-5,5) degrees, in-plane zoom U(0.9,1.1); trilinear image
    warp, per-class soft label warp thresholded at 0.5.
    """
    b, d, h, w, c = image.shape
    size = jnp.asarray([d, h, w], jnp.float32)

    def one(key, img, lab):
        kt, kr, kz1, kz2, kt1, kt2 = jax.random.split(key, 6)
        translation = jnp.where(
            "t" in mode,
            jnp.stack([
                jnp.float32(0),
                jax.random.uniform(kt1, minval=-5.0, maxval=5.0),
                jax.random.uniform(kt2, minval=-5.0, maxval=5.0),
            ]),
            jnp.zeros(3),
        )
        angle = jnp.where(
            "r" in mode,
            jax.random.uniform(kr, minval=-5.0, maxval=5.0) / 180.0 * jnp.pi,
            0.0,
        )
        zoom = jnp.where(
            "z" in mode,
            jnp.stack([
                jnp.float32(1),
                jax.random.uniform(kz1, minval=0.9, maxval=1.1),
                jax.random.uniform(kz2, minval=0.9, maxval=1.1),
            ]),
            jnp.ones(3),
        )
        ca, sa = jnp.cos(angle), jnp.sin(angle)
        rot = jnp.array([[1, 0, 0], [0, 0, 0], [0, 0, 0]], jnp.float32)
        rot = rot.at[1, 1].set(ca).at[1, 2].set(-sa).at[2, 1].set(sa).at[2, 2].set(ca)
        M = rot @ jnp.diag(zoom)

        grid = jnp.stack(
            jnp.meshgrid(
                jnp.arange(d, dtype=jnp.float32),
                jnp.arange(h, dtype=jnp.float32),
                jnp.arange(w, dtype=jnp.float32),
                indexing="ij",
            )
        )  # (3, D, H, W)
        centered = grid - (size / 2.0)[:, None, None, None]
        warped = jnp.einsum("ij,j...->i...", M, centered)
        warped = warped + (size / 2.0 + translation)[:, None, None, None]

        def sample(vol):
            return jax.scipy.ndimage.map_coordinates(vol, list(warped), order=1, cval=0.0)

        img_w = jnp.stack([sample(img[..., ch]) for ch in range(c)], axis=-1)
        lab_w = jnp.zeros(lab.shape, jnp.float32)
        for z in range(1, num_classes):
            soft = sample((lab == z).astype(jnp.float32))
            lab_w = jnp.where(soft >= 0.5, jnp.float32(z), lab_w)
        return img_w, lab_w

    keys = jax.random.split(key, b)
    return jax.vmap(one)(keys, image, label)


@jax.jit
def random_gamma(key: Array, image: Array, lo: float = 0.8, hi: float = 1.2) -> Array:
    """Per-sample gamma adjust (ref transformer_2d.py:279-305)."""
    b = image.shape[0]
    gamma = jax.random.uniform(key, (b,), minval=lo, maxval=hi)
    gamma = gamma.reshape((b,) + (1,) * (image.ndim - 1))
    return jnp.power(jnp.maximum(image, 0.0), gamma)


@jax.jit
def random_noise(key: Array, image: Array, p: float = 0.1, sigma: float = 0.1) -> Array:
    """Gaussian noise with probability p per sample (ref transformer_2d.py:308-322)."""
    b = image.shape[0]
    k1, k2 = jax.random.split(key)
    apply = jax.random.uniform(k1, (b,)) > (1.0 - p)
    apply = apply.reshape((b,) + (1,) * (image.ndim - 1))
    noise = jax.random.normal(k2, image.shape) * sigma
    noisy = jnp.clip(image + noise, 0.0, 1.0)
    return jnp.where(apply, noisy, image)


def augment_batch_3d(
    key: Array,
    image: Array,
    label: Array,
    patch: Tuple[int, ...],
    num_classes: int = 2,
    affine_mode: str = "tr",
):
    """Composed device-side 3D train pipeline matching transform_3d=[1,2,4,5,6]:
    crop -> PET/CT normalize -> affine -> flip -> one-hot."""
    k1, k2, k3 = jax.random.split(key, 3)
    image, label = random_crop(k1, image, label, patch)
    image = pet_ct_normalize(image)
    image, label = random_affine_3d(k2, image, label, num_classes, affine_mode)
    image, label = random_flip(k3, image, label)
    return image, to_onehot(label, num_classes)

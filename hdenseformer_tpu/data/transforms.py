"""Deterministic host-side preprocessing transforms.

Numerical re-derivations of the reference normalizers/tensorizers
(data_utils/data_loader.py:16-159) with two changes:
- every stochastic transform takes an explicit ``numpy.random.Generator``
  (PRNG-discipline instead of global ``random``/``np.random`` state), so a
  (seed, epoch, index) triple fully determines the sample;
- the final tensorization emits channels-LAST arrays (TPU layout): image
  ``(*spatial, C)``, one-hot label ``(*spatial, num_class)`` with
  background-as-complement in channel 0 — same math as To_Tensor
  (data_loader.py:146-151), axis moved.

Sample convention inside the pipeline (matches reference): ``image`` is
``(C, *spatial)`` or ``(*spatial)``, ``label`` is ``(*spatial)`` with
integer class values.

``resize_half_pixel`` replaces skimage.transform.resize (not available
here): linear interpolation at half-pixel centers with optional gaussian
anti-aliasing (sigma = (scale-1)/2, skimage's default) — same convention,
different edge handling at borders only.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
from scipy import ndimage


def resize_half_pixel(
    image: np.ndarray,
    out_shape: Sequence[int],
    order: int = 1,
    anti_aliasing: bool = False,
) -> np.ndarray:
    """skimage-style resize: half-pixel sampling, optional gaussian AA."""
    out_shape = tuple(int(s) for s in out_shape)
    if image.shape == out_shape:
        return image.astype(np.float32, copy=True)
    img = image.astype(np.float32)
    factors = np.array(
        [i / o for i, o in zip(image.shape, out_shape)], dtype=np.float64
    )
    if anti_aliasing:
        sigma = np.maximum(0.0, (factors - 1.0) / 2.0)
        if np.any(sigma > 0):
            img = ndimage.gaussian_filter(img, sigma, mode="mirror")
    coords = np.meshgrid(
        *[
            (np.arange(o, dtype=np.float64) + 0.5) * f - 0.5
            for o, f in zip(out_shape, factors)
        ],
        indexing="ij",
    )
    return ndimage.map_coordinates(
        img, np.asarray(coords), order=order, mode="nearest"
    ).astype(np.float32)


def resize_label_per_class(
    label: np.ndarray, out_shape: Sequence[int], num_class: int
) -> np.ndarray:
    """Per-class soft resize with 0.5 threshold (ref data_loader.py:113-119)."""
    out = np.zeros(tuple(out_shape), dtype=np.float32)
    for z in range(1, num_class):
        roi = resize_half_pixel((label == z).astype(np.float32), out_shape, order=1)
        out[roi >= 0.5] = z
    return out


class TruncAndNormalize:
    """CT window truncation to [0,1] (ref data_loader.py:16-36)."""

    def __init__(self, scale: Optional[Tuple[float, float]] = None):
        self.scale = scale
        if self.scale is not None:
            assert len(self.scale) == 2, "scale error"

    def __call__(self, sample, rng=None):
        image = sample["image"].astype(np.float32)
        image = image - self.scale[0]
        gray_range = self.scale[1] - self.scale[0]
        image = np.clip(image, 0, gray_range) / gray_range
        sample["image"] = image
        return sample


class MRNormalize:
    """Per-channel max-division, negatives clipped (ref data_loader.py:39-50)."""

    def __call__(self, sample, rng=None):
        image = sample["image"].astype(np.float32)
        if image.ndim > sample["label"].ndim:
            for i in range(image.shape[0]):
                m = np.max(image[i])
                if m != 0:
                    image[i] = image[i] / m
        else:
            m = np.max(image)
            if m != 0:
                image = image / m
        image[image < 0] = 0
        sample["image"] = image
        return sample


class PETandCTNormalize:
    """ch0: CT clip +-w then /w; ch1: PET z-score (ref data_loader.py:53-68)."""

    def __init__(self, mean: float = 0.0, w: float = 1024.0):
        self.mean = mean
        self.w = w

    def __call__(self, sample, rng=None):
        image = sample["image"].astype(np.float32)
        image[0] = (np.clip(image[0], self.mean - self.w, self.mean + self.w) - self.mean) / self.w
        m = np.mean(image[1])
        s = np.std(image[1])
        image[1] = (image[1] - m) / (s + 1e-3)
        sample["image"] = image
        return sample


class CropResize:
    """Crop border then resize to fixed dim (ref data_loader.py:71-123)."""

    def __init__(self, dim=None, num_class: int = 2, crop: int = 0, channel: int = 1):
        self.dim = tuple(dim) if dim is not None else None
        self.num_class = num_class
        self.crop = crop
        self.channel = channel

    def __call__(self, sample, rng=None):
        image = sample["image"]
        label = sample["label"]
        mm = 1 if self.channel > 1 else 0
        c = self.crop
        if c != 0:
            if mm:
                image = image[..., c:-c, c:-c]
                label = label[..., c:-c, c:-c]
            elif image.ndim == 2:
                image = image[c:-c, c:-c]
                label = label[c:-c, c:-c]
            else:
                image = image[:, c:-c, c:-c]
                label = label[:, c:-c, c:-c]
        if self.dim is not None and label.shape != self.dim:
            if mm:
                out = np.empty((self.channel,) + self.dim, dtype=np.float32)
                for i in range(image.shape[0]):
                    out[i] = resize_half_pixel(image[i], self.dim, anti_aliasing=True)
                image = out
            else:
                image = resize_half_pixel(image, self.dim, anti_aliasing=True)
            label = resize_label_per_class(label, self.dim, self.num_class)
        sample["image"] = image
        sample["label"] = label
        return sample


class ToOneHot:
    """Tensorize to channels-last device arrays (ref To_Tensor, data_loader.py:126-159).

    image -> (*spatial, C) float32; label -> (*spatial, num_class) one-hot
    with channel 0 = complement of the foreground union.
    """

    def __init__(self, num_class: int = 2, input_channel: int = 3):
        self.num_class = num_class
        self.channel = input_channel

    def __call__(self, sample, rng=None):
        image = np.asarray(sample["image"], dtype=np.float32)
        label = np.asarray(sample["label"])
        if self.channel > 1:
            image = image[: self.channel]
        else:
            if image.ndim == label.ndim:
                image = image[None]
        onehot = np.zeros(label.shape + (self.num_class,), dtype=np.float32)
        for z in range(1, self.num_class):
            onehot[..., z] = (label == z).astype(np.float32)
        onehot[..., 0] = (np.amax(onehot[..., 1:], axis=-1) == 0).astype(np.float32)
        sample["image"] = np.ascontiguousarray(np.moveaxis(image, 0, -1))
        sample["label"] = onehot
        return sample


def remap_roi_labels(label: np.ndarray, roi_number, num_class: int) -> np.ndarray:
    """ROI extraction (ref data_loader.py:192-201)."""
    if roi_number is None:
        return label
    if isinstance(roi_number, list):
        assert num_class == len(roi_number) + 1
        out = np.zeros_like(label, dtype=np.float32)
        for i, roi in enumerate(roi_number):
            out[label == roi] = i + 1
        return out
    assert num_class == 2
    return (label == roi_number).astype(np.float32)


class RawChannelsLast:
    """Minimal tensorization for the device-augment path: image to
    channels-last float32, label kept as integer volume (augmentation,
    normalization and one-hot all happen on device, data/augment_jax.py)."""

    def __call__(self, sample, rng=None):
        image = np.asarray(sample["image"], dtype=np.float32)
        label = np.asarray(sample["label"], dtype=np.float32)
        if image.ndim == label.ndim:
            image = image[None]
        sample["image"] = np.ascontiguousarray(np.moveaxis(image, 0, -1))
        sample["label"] = label
        return sample


class Compose:
    """Sequential transform composition threading the RNG through."""

    def __init__(self, transforms):
        self.transforms = list(transforms)

    def __call__(self, sample, rng=None):
        for t in self.transforms:
            sample = t(sample, rng)
        return sample

"""Offline data conversion: NIfTI -> per-case HDF5, resampling, resizing.

Capability parity with the reference converter/ + data_utils/resize.py:
- ``nii2npy_hecktor``: per patient dir, stack [ct, pet] int16 + gtvt label
  (converter/nii2npy_hecktor.py:28-52);
- ``nii2npy_brats``: stack [flair, t1ce, t1, t2], label 4 -> 3
  (converter/nii2npy_brats.py:28-57);
- ``resample_image``: spacing resample with selectable interpolation
  (converter/utils.py:98-177, SimpleITK-free);
- ``resize_data`` / ``split_and_resize_data``: fixed-grid resize + train/
  test split (data_utils/resize.py:24-102). The reference's stray ``break``
  at resize.py:102 (only one sample processed) is a bug NOT replicated.

All IO is host-side (numpy + h5py + the built-in NIfTI reader in
data/io.py); the per-volume resample math is vectorized numpy.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import numpy as np

from hdenseformer_tpu.data.io import read_nifti, save_as_hdf5
from hdenseformer_tpu.data.transforms import resize_half_pixel, resize_label_per_class


def get_paths_to_patient_files(path_to_imgs: str, append_mask: bool = True) -> list:
    """Per-patient (ct, pet[, mask]) NIfTI path tuples.

    Equivalent of converter/utils.py:10-41: one sub-directory per patient
    named ``<id>``, holding ``<id>_ct.nii.gz`` / ``<id>_pt.nii.gz`` and
    (optionally) the ``<id>_ct_gtvt.nii.gz`` annotation.
    """
    patients = sorted(
        p for p in os.listdir(path_to_imgs)
        if os.path.isdir(os.path.join(path_to_imgs, p))
    )
    paths = []
    for p in patients:
        d = os.path.join(path_to_imgs, p)
        entry = (os.path.join(d, p + "_ct.nii.gz"), os.path.join(d, p + "_pt.nii.gz"))
        if append_mask:
            entry = entry + (os.path.join(d, p + "_ct_gtvt.nii.gz"),)
        paths.append(entry)
    return paths


def get_train_val_paths(all_paths: list, path_to_train_val_split: str) -> Tuple[list, list]:
    """Split patient path tuples by a JSON id file {'train': [...], 'val': [...]}.

    Equivalent of converter/utils.py:44-70 (which json-loads its
    "pkl"-named split file): a path lands in a set when any of that set's
    patient ids is a prefix of its CT filename.
    """
    import json

    with open(path_to_train_val_split) as f:
        split = json.load(f)

    def member(entry, ids):
        ct = str(entry[0])
        return any(pid + "_ct.nii.gz" in ct for pid in ids)

    train = [e for e in all_paths if member(e, split["train"])]
    val = [e for e in all_paths if member(e, split["val"])]
    return train, val


def _map_coordinates_resize(array: np.ndarray, new_size, order: int) -> np.ndarray:
    """Half-pixel-convention spline resize via scipy map_coordinates."""
    from scipy.ndimage import map_coordinates

    coords = np.meshgrid(
        *[
            (np.arange(ns) + 0.5) * sh / ns - 0.5
            for ns, sh in zip(new_size, array.shape)
        ],
        indexing="ij",
    )
    return map_coordinates(
        array.astype(np.float32), coords, order=order, mode="nearest"
    )


_SINC_WINDOWS = {
    # window(x/m) for |x| <= m (ITK WindowedSincInterpolateImageFunction
    # window family, radius m=3 like the sitk interpolator typedefs)
    "hamming_sinc": lambda u: 0.54 + 0.46 * np.cos(np.pi * u),
    "cosine_sinc": lambda u: np.cos(np.pi * u / 2.0),
    "welch_sinc": lambda u: 1.0 - u * u,
    "lanczos_sinc": lambda u: np.sinc(u),
    "blackman_sinc": lambda u: 0.42 + 0.5 * np.cos(np.pi * u)
    + 0.08 * np.cos(2.0 * np.pi * u),
}


def _kernel_resize(array: np.ndarray, new_size, kernel, radius: float) -> np.ndarray:
    """Separable kernel resample on the reference's corner-aligned grid
    (input position = i_out * old / new, the ResampleImageFilter mapping
    with preserved origin). Weights are normalized per output sample."""
    out = array.astype(np.float32)
    for ax, (ns, sh) in enumerate(zip(new_size, array.shape)):
        pos = np.arange(ns) * (sh / ns)  # (ns,)
        lo = np.ceil(pos - radius).astype(int)
        taps = np.arange(int(2 * radius) + 1)
        j = lo[:, None] + taps[None, :]  # (ns, ntaps) input indices
        x = pos[:, None] - j
        w = kernel(x) * (np.abs(x) <= radius)
        w = w / np.maximum(w.sum(axis=1, keepdims=True), 1e-12)
        jc = np.clip(j, 0, sh - 1)
        moved = np.moveaxis(out, ax, 0)  # (sh, ...)
        gathered = moved[jc]  # (ns, ntaps, ...)
        res = np.einsum("nt,nt...->n...", w.astype(np.float32), gathered)
        out = np.moveaxis(res, 0, ax)
    return out


def resample_image(
    array: np.ndarray,
    spacing: Sequence[float],
    new_spacing: Optional[Sequence[float]] = None,
    new_size: Optional[Sequence[int]] = None,
    is_label: bool = False,
    interpolator: str = "linear",
    gaussian_sigma: float = 0.8,
) -> Tuple[np.ndarray, Tuple[float, ...]]:
    """Resample (z,y,x) array to a new spacing or explicit size.

    Equivalent of converter/utils.py:98-177: exactly one of new_spacing /
    new_size; ``interpolator`` mirrors the reference's selectable sitk
    interpolators — 'linear' (default), 'nearest', 'bspline' (cubic
    spline), 'gaussian' (separable gaussian kernel, sigma in voxels),
    'label_gaussian' (per-class gaussian smoothing + argmax), and the
    windowed-sinc family 'hamming_sinc' / 'cosine_sinc' / 'welch_sinc' /
    'lanczos_sinc' / 'blackman_sinc' (radius-3 kernels like ITK's
    WindowedSincInterpolateImageFunction). ``is_label=True`` always
    resamples nearest (identical to the converters' usage).
    """
    if (new_spacing is None) == (new_size is None):
        raise ValueError("specify exactly one of new_spacing / new_size")
    spacing = np.asarray(spacing, np.float64)
    if new_size is None:
        new_spacing_arr = np.asarray(new_spacing, np.float64)
        new_size = np.round(array.shape * spacing / new_spacing_arr).astype(int)
    new_size = tuple(int(s) for s in new_size)
    out_spacing = tuple(
        float(sp * sh / ns) for sp, sh, ns in zip(spacing, array.shape, new_size)
    )
    if is_label or interpolator == "nearest":
        idx = [
            np.minimum(
                np.floor(np.arange(ns) * sh / ns).astype(int), sh - 1
            )
            for ns, sh in zip(new_size, array.shape)
        ]
        out = array[np.ix_(*idx)]
    elif interpolator == "linear":
        out = resize_half_pixel(array.astype(np.float32), new_size, order=1)
    elif interpolator == "bspline":
        out = _map_coordinates_resize(array, new_size, order=3)
    elif interpolator == "gaussian":
        out = _kernel_resize(
            array, new_size,
            kernel=lambda x: np.exp(-0.5 * (x / gaussian_sigma) ** 2),
            radius=max(3.0 * gaussian_sigma, 1.0),
        )
    elif interpolator == "label_gaussian":
        labels = np.unique(array)
        smoothed = np.stack([
            _kernel_resize(
                (array == lab).astype(np.float32), new_size,
                kernel=lambda x: np.exp(-0.5 * (x / gaussian_sigma) ** 2),
                radius=max(3.0 * gaussian_sigma, 1.0),
            )
            for lab in labels
        ])
        out = labels[np.argmax(smoothed, axis=0)].astype(array.dtype)
    elif interpolator in _SINC_WINDOWS:
        m = 3.0
        window = _SINC_WINDOWS[interpolator]
        out = _kernel_resize(
            array, new_size,
            kernel=lambda x: np.sinc(x) * window(np.clip(x / m, -1.0, 1.0)),
            radius=m,
        )
    else:
        raise ValueError(
            f"unknown interpolator {interpolator!r}; options: linear/nearest/"
            f"bspline/gaussian/label_gaussian/" + "/".join(_SINC_WINDOWS)
        )
    return out, out_spacing


def nii2npy_hecktor(
    input_dir: str,
    save_dir: str,
    img_key: str = "ct",
    lab_key: str = "seg",
) -> list:
    """Per-patient [ct, pet] stack + gtvt label -> <patient>.hdf5.

    Expects <patient>/<patient>_ct.nii.gz, _pt.nii.gz, _gtvt.nii.gz
    (reference layout, converter/nii2npy_hecktor.py:34-52).
    """
    os.makedirs(save_dir, exist_ok=True)
    written = []
    for entry in sorted(os.scandir(input_dir), key=lambda e: e.name):
        if not entry.is_dir():
            continue
        pid = entry.name
        def find(suffix):
            for ext in (".nii.gz", ".nii"):
                p = os.path.join(entry.path, f"{pid}{suffix}{ext}")
                if os.path.exists(p):
                    return p
            raise FileNotFoundError(f"{pid}{suffix} not found in {entry.path}")

        ct, _ = read_nifti(find("_ct"))
        pt, _ = read_nifti(find("_pt"))
        seg, _ = read_nifti(find("_gtvt"))
        images = np.stack([ct, pt]).astype(np.int16)
        labels = seg.astype(np.uint8)
        out = os.path.join(save_dir, f"{pid}.hdf5")
        if os.path.exists(out):
            os.remove(out)
        save_as_hdf5(images, out, img_key)
        save_as_hdf5(labels, out, lab_key)
        written.append(out)
    return written


def nii2npy_brats(
    input_dir: str,
    save_dir: str,
    img_key: str = "image",
    lab_key: str = "label",
) -> list:
    """Per-case [flair, t1ce, t1, t2] stack, label 4->3 (ref nii2npy_brats.py:34-57)."""
    os.makedirs(save_dir, exist_ok=True)
    written = []
    for entry in sorted(os.scandir(input_dir), key=lambda e: e.name):
        if not entry.is_dir():
            continue
        cid = entry.name
        def find(suffix):
            for ext in (".nii.gz", ".nii"):
                p = os.path.join(entry.path, f"{cid}{suffix}{ext}")
                if os.path.exists(p):
                    return p
            raise FileNotFoundError(f"{cid}{suffix} not found in {entry.path}")

        mods = [read_nifti(find(f"_{m}"))[0] for m in ("flair", "t1ce", "t1", "t2")]
        seg, _ = read_nifti(find("_seg"))
        labels = seg.astype(np.uint8)
        labels[labels == 4] = 3
        images = np.stack(mods).astype(np.int16)
        out = os.path.join(save_dir, f"{cid}.hdf5")
        if os.path.exists(out):
            os.remove(out)
        save_as_hdf5(images, out, img_key)
        save_as_hdf5(labels, out, lab_key)
        written.append(out)
    return written


def resize_data(
    input_dir: str,
    save_dir: str,
    target_size: Sequence[int] = (144, 144, 144),
    num_class: int = 2,
    img_key: str = "ct",
    lab_key: str = "seg",
) -> list:
    """Resize every case to a fixed grid (ref data_utils/resize.py:24-49)."""
    from hdenseformer_tpu.data.io import hdf5_reader

    os.makedirs(save_dir, exist_ok=True)
    written = []
    for name in sorted(os.listdir(input_dir)):
        if not name.endswith(".hdf5"):
            continue
        src = os.path.join(input_dir, name)
        image = hdf5_reader(src, img_key)
        label = hdf5_reader(src, lab_key)
        if image.ndim == 4:
            image = np.stack(
                [resize_half_pixel(image[i], target_size, anti_aliasing=True)
                 for i in range(image.shape[0])]
            )
        else:
            image = resize_half_pixel(image, target_size, anti_aliasing=True)
        label = resize_label_per_class(label, target_size, num_class)
        out = os.path.join(save_dir, name)
        if os.path.exists(out):
            os.remove(out)
        save_as_hdf5(image.astype(np.float32), out, img_key)
        save_as_hdf5(label.astype(np.uint8), out, lab_key)
        written.append(out)
    return written


def split_and_resize_data(
    input_dir: str,
    save_dir: str,
    target_size: Sequence[int] = (144, 144, 144),
    retain: int = 44,
    num_class: int = 2,
    img_key: str = "ct",
    lab_key: str = "seg",
    seed: int = 0,
) -> Tuple[list, list]:
    """Shuffle-split into train/test dirs then resize ALL cases.

    Ref data_utils/resize.py:52-102 — without the stray ``break`` bug that
    stops the reference after one sample.
    """
    cases = sorted(n for n in os.listdir(input_dir) if n.endswith(".hdf5"))
    rng = np.random.default_rng(seed)
    rng.shuffle(cases)
    test_cases, train_cases = cases[:retain], cases[retain:]
    out_train, out_test = [], []
    for subset, names, sink in (
        ("train", train_cases, out_train),
        ("test", test_cases, out_test),
    ):
        sub_in = os.path.join(save_dir, subset)
        os.makedirs(sub_in, exist_ok=True)
        for name in names:
            from hdenseformer_tpu.data.io import hdf5_reader

            src = os.path.join(input_dir, name)
            image = hdf5_reader(src, img_key)
            label = hdf5_reader(src, lab_key)
            if image.ndim == 4:
                image = np.stack(
                    [resize_half_pixel(image[i], target_size, anti_aliasing=True)
                     for i in range(image.shape[0])]
                )
            else:
                image = resize_half_pixel(image, target_size, anti_aliasing=True)
            label = resize_label_per_class(label, target_size, num_class)
            out = os.path.join(sub_in, name)
            if os.path.exists(out):
                os.remove(out)
            save_as_hdf5(image.astype(np.float32), out, img_key)
            save_as_hdf5(label.astype(np.uint8), out, lab_key)
            sink.append(out)
    return out_train, out_test

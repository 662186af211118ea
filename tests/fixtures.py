"""Synthetic HDF5 case fixtures (SURVEY.md §7.2 step 1).

Generates per-case .hdf5 files with the reference schema: image (C, D, H, W)
int16-ish CT/PET values and a blob label, keys ('ct','seg') or
('image','label').
"""
import os

import h5py
import numpy as np


def make_case(
    path: str,
    shape=(32, 32, 32),
    channels: int = 2,
    num_classes: int = 2,
    img_key: str = "ct",
    lab_key: str = "seg",
    seed: int = 0,
):
    rng = np.random.RandomState(seed)
    image = rng.randint(-1024, 2000, size=(channels,) + tuple(shape)).astype(np.int16)
    label = np.zeros(shape, dtype=np.uint8)
    for c in range(1, num_classes):
        center = [rng.randint(s // 4, 3 * s // 4) for s in shape]
        radius = max(2, min(shape) // 6)
        grids = np.ogrid[tuple(slice(0, s) for s in shape)]
        dist = sum((g - cc) ** 2 for g, cc in zip(grids, center))
        label[dist <= radius**2] = c
    with h5py.File(path, "w") as f:
        f.create_dataset(img_key, data=image)
        f.create_dataset(lab_key, data=label)
    return image, label


def make_dataset_dir(
    tmpdir,
    n_cases: int = 6,
    shape=(32, 32, 32),
    channels: int = 2,
    num_classes: int = 2,
    img_key: str = "ct",
    lab_key: str = "seg",
):
    paths = []
    os.makedirs(tmpdir, exist_ok=True)
    for i in range(n_cases):
        p = os.path.join(tmpdir, f"sample{i}_case.hdf5")
        make_case(
            p, shape=shape, channels=channels, num_classes=num_classes,
            img_key=img_key, lab_key=lab_key, seed=i,
        )
        paths.append(p)
    return paths

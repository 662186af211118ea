"""Data pipeline: IO, transforms, augmentations, loader determinism."""
import numpy as np
import pytest

from fixtures import make_case, make_dataset_dir

from hdenseformer_tpu.data import (
    SegDataset,
    BatchLoader,
    get_cross_validation_by_sample,
    hdf5_reader,
)
from hdenseformer_tpu.data.io import read_nifti, write_nifti
from hdenseformer_tpu.data.transforms import (
    Compose,
    CropResize,
    MRNormalize,
    PETandCTNormalize,
    ToOneHot,
    TruncAndNormalize,
    resize_half_pixel,
)
from hdenseformer_tpu.data.augment3d import (
    RandomCrop3D,
    RandomFlip3D,
    RandomTranslationRotationZoom3D,
)
from hdenseformer_tpu.data.augment2d import (
    RandomAdjust2D,
    RandomDistort2D,
    RandomErase2D,
    RandomFlip2D,
    RandomNoise2D,
    RandomRotate2D,
    RandomZoom2D,
)


def test_hdf5_roundtrip(tmp_path):
    p = str(tmp_path / "case_1.hdf5")
    img, lab = make_case(p, shape=(8, 8, 8), channels=2)
    np.testing.assert_array_equal(hdf5_reader(p, "ct"), img.astype(np.float32))
    np.testing.assert_array_equal(hdf5_reader(p, "seg"), lab.astype(np.float32))


def test_nifti_roundtrip(tmp_path, rng):
    for suffix in [".nii", ".nii.gz"]:
        p = str(tmp_path / f"vol{suffix}")
        arr = rng.randn(5, 6, 7).astype(np.float32)
        write_nifti(p, arr, spacing=(2.0, 1.0, 0.5))
        back, spacing = read_nifti(p)
        np.testing.assert_allclose(back, arr, rtol=1e-6)
        assert spacing == pytest.approx((2.0, 1.0, 0.5))


def test_nifti_int16_roundtrip(tmp_path, rng):
    p = str(tmp_path / "vol.nii.gz")
    arr = rng.randint(-1024, 2000, size=(4, 5, 6)).astype(np.int16)
    write_nifti(p, arr)
    back, _ = read_nifti(p)
    np.testing.assert_array_equal(back, arr)


def test_kfold_split_partitions():
    paths = [f"/data/p{i:02d}_case{j}.hdf5" for i in range(10) for j in range(2)]
    seen_val = set()
    for fold in range(1, 6):
        tr, va = get_cross_validation_by_sample(paths, 5, fold, shuffle_seed=0)
        assert len(tr) + len(va) == len(paths)
        assert not set(tr) & set(va)
        # samples (patients) never straddle the split
        tr_ids = {p.split("/")[-1].split("_")[0] for p in tr}
        va_ids = {p.split("/")[-1].split("_")[0] for p in va}
        assert not tr_ids & va_ids
        seen_val |= va_ids
    assert len(seen_val) == 10  # all patients validated across folds


def test_trunc_and_normalize():
    img = np.array([[-200.0, -100.0, 0.0, 100.0, 300.0]])
    s = TruncAndNormalize(scale=(-100, 200))({"image": img, "label": np.zeros(1)})
    np.testing.assert_allclose(s["image"], [[0, 0, 1 / 3, 2 / 3, 1.0]], atol=1e-6)


def test_pet_ct_normalize(rng):
    img = rng.randn(2, 8, 8, 8).astype(np.float32) * 500
    s = PETandCTNormalize()({"image": img.copy(), "label": np.zeros((8, 8, 8))})
    assert np.abs(s["image"][0]).max() <= 1.0
    assert abs(np.mean(s["image"][1])) < 0.1


def test_mr_normalize(rng):
    img = np.abs(rng.randn(3, 8, 8).astype(np.float32))
    s = MRNormalize()({"image": img.copy(), "label": np.zeros((8, 8))})
    assert s["image"].max() <= 1.0
    assert s["image"].min() >= 0.0


def test_onehot_background_complement():
    lab = np.zeros((4, 4), np.float32)
    lab[1:3, 1:3] = 1
    s = ToOneHot(num_class=2, input_channel=1)(
        {"image": np.ones((4, 4), np.float32), "label": lab}
    )
    assert s["image"].shape == (4, 4, 1)
    assert s["label"].shape == (4, 4, 2)
    np.testing.assert_array_equal(s["label"][..., 0] + s["label"][..., 1], 1)
    np.testing.assert_array_equal(s["label"][..., 1], lab)


def test_crop_resize_label_preserved():
    rng = np.random.default_rng(0)
    lab = np.zeros((16, 16), np.float32)
    lab[4:12, 4:12] = 1
    img = np.ones((16, 16), np.float32)
    s = CropResize(dim=(8, 8), num_class=2, crop=0, channel=1)(
        {"image": img, "label": lab}
    )
    assert s["image"].shape == (8, 8)
    assert s["label"].shape == (8, 8)
    assert s["label"].max() == 1


def test_resize_half_pixel_constant_preserved():
    img = np.full((10, 10), 3.7, np.float32)
    out = resize_half_pixel(img, (5, 5), anti_aliasing=True)
    np.testing.assert_allclose(out, 3.7, rtol=1e-5)


def test_random_crop_3d_shape():
    rng = np.random.default_rng(0)
    s = {"image": np.zeros((2, 20, 20, 20), np.float32), "label": np.zeros((20, 20, 20), np.float32)}
    out = RandomCrop3D((8, 8, 8))(s, rng)
    assert out["image"].shape == (2, 8, 8, 8)
    assert out["label"].shape == (8, 8, 8)


def test_random_affine_3d_identity_stats(rng):
    g = np.random.default_rng(3)
    img = np.random.RandomState(0).rand(12, 12, 12).astype(np.float32)
    lab = np.zeros((12, 12, 12), np.float32)
    lab[4:8, 4:8, 4:8] = 1
    out = RandomTranslationRotationZoom3D(mode="tr", num_class=2)(
        {"image": img.copy(), "label": lab.copy()}, g
    )
    assert out["image"].shape == img.shape
    assert set(np.unique(out["label"])) <= {0.0, 1.0}


def test_random_flip_3d_deterministic():
    img = np.arange(2 * 4 * 4 * 4, dtype=np.float32).reshape(2, 4, 4, 4)
    lab = np.arange(4 * 4 * 4, dtype=np.float32).reshape(4, 4, 4)
    out1 = RandomFlip3D("hv")({"image": img.copy(), "label": lab.copy()}, np.random.default_rng(1))
    out2 = RandomFlip3D("hv")({"image": img.copy(), "label": lab.copy()}, np.random.default_rng(1))
    np.testing.assert_array_equal(out1["image"], out2["image"])


def test_2d_augs_smoke(rng):
    g = np.random.default_rng(0)
    img = np.abs(np.random.RandomState(0).rand(3, 32, 32)).astype(np.float32)
    lab = np.zeros((32, 32), np.float32)
    lab[10:20, 10:20] = 1
    s = {"image": img.copy(), "label": lab.copy()}
    for aug in [
        RandomErase2D(scale_flag=False),
        RandomFlip2D("hv"),
        RandomRotate2D(),
        RandomZoom2D(),
        RandomAdjust2D(),
        RandomNoise2D(),
        RandomDistort2D(),
    ]:
        s = aug(s, g)
        assert s["image"].shape == (3, 32, 32), type(aug).__name__
        assert s["label"].shape == (32, 32), type(aug).__name__
        assert np.isfinite(s["image"]).all(), type(aug).__name__


def test_batch_loader_deterministic(tmp_path):
    paths = make_dataset_dir(str(tmp_path), n_cases=5, shape=(8, 8, 8), channels=2)
    tfm = Compose([PETandCTNormalize(), ToOneHot(num_class=2, input_channel=2)])
    ds = SegDataset(paths, num_class=2, transform=tfm)
    loader = BatchLoader(ds, batch_size=2, shuffle=True, num_workers=2, seed=42)
    b1 = [b["image"].copy() for b in loader.epoch(0)]
    b2 = [b["image"].copy() for b in loader.epoch(0)]
    assert len(b1) == loader.steps_per_epoch() == 3
    for a, b in zip(b1, b2):
        np.testing.assert_array_equal(a, b)
    assert b1[0].shape == (2, 8, 8, 8, 2)


def test_batch_loader_epoch_shuffles(tmp_path):
    paths = make_dataset_dir(str(tmp_path), n_cases=8, shape=(4, 4, 4), channels=2)
    ds = SegDataset(paths, num_class=2, transform=Compose([ToOneHot(2, 2)]))
    loader = BatchLoader(ds, batch_size=8, shuffle=True, num_workers=2, seed=0)
    e0 = next(iter(loader.epoch(0)))["image"]
    e1 = next(iter(loader.epoch(1)))["image"]
    assert not np.array_equal(e0, e1)

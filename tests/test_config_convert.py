"""Config presets + offline conversion pipeline."""
import os

import numpy as np
import pytest

from hdenseformer_tpu.configs import get_config
from hdenseformer_tpu.data.convert import (
    nii2npy_hecktor,
    resample_image,
    resize_data,
    split_and_resize_data,
)
from hdenseformer_tpu.data.io import hdf5_reader, write_nifti
from fixtures import make_dataset_dir


def test_config_autoselect_rules():
    cfg = get_config("Hecktor21")
    assert cfg.loss_fun == "FocalLoss"  # binary -> FocalLoss (config.py:127)
    assert cfg.use_ds is True  # DenseFormer in net name (config.py:136)
    assert cfg.batch_size == 2  # 3d mode (config.py:77)

    cfg2 = get_config("PI-CAI22", net_name="HDenseFormer_2D_32", mode="2d_seg")
    assert cfg2.batch_size == 24
    cfg3 = get_config("BraTS21")
    assert cfg3.loss_fun == "CEPlusDice"  # multiclass


def test_config_presets_table():
    assert get_config("Hecktor21").channels == 2
    assert get_config("BraTS21").channels == 4
    assert get_config("LITS").roi_number == 2
    assert get_config("LITS").scale == (-100, 200)
    assert get_config("PI-CAI22").input_shape == (384, 384)


def test_config_kwargs_shapes():
    cfg = get_config("Hecktor21")
    init_kw = cfg.init_trainer_kwargs()
    assert init_kw["key_touple"] == ("ct", "seg")
    setup_kw = cfg.setup_trainer_kwargs()
    assert setup_kw["lr_scheduler"] == "poly_lr"


def test_unknown_key_rejected():
    with pytest.raises(ValueError):
        get_config("Hecktor21", bogus_key=1)


def test_resample_image_spacing():
    vol = np.random.RandomState(0).rand(10, 20, 20).astype(np.float32)
    out, new_sp = resample_image(vol, spacing=(2.0, 1.0, 1.0), new_spacing=(1.0, 1.0, 1.0))
    assert out.shape == (20, 20, 20)
    assert new_sp == pytest.approx((1.0, 1.0, 1.0))
    lab = (vol > 0.5).astype(np.uint8)
    out_l, _ = resample_image(lab, (2.0, 1.0, 1.0), new_spacing=(1.0, 1.0, 1.0), is_label=True)
    assert set(np.unique(out_l)) <= {0, 1}


def test_nii2npy_hecktor(tmp_path):
    rng = np.random.RandomState(0)
    for pid in ["CHUM001", "CHUM002"]:
        d = tmp_path / "raw" / pid
        d.mkdir(parents=True)
        write_nifti(str(d / f"{pid}_ct.nii.gz"), rng.randint(-1000, 1000, (8, 8, 8)).astype(np.int16))
        write_nifti(str(d / f"{pid}_pt.nii.gz"), rng.rand(8, 8, 8).astype(np.float32) * 10)
        lab = np.zeros((8, 8, 8), np.uint8)
        lab[2:5, 2:5, 2:5] = 1
        write_nifti(str(d / f"{pid}_gtvt.nii.gz"), lab)
    written = nii2npy_hecktor(str(tmp_path / "raw"), str(tmp_path / "h5"))
    assert len(written) == 2
    img = hdf5_reader(written[0], "ct")
    seg = hdf5_reader(written[0], "seg")
    assert img.shape == (2, 8, 8, 8)
    assert seg.shape == (8, 8, 8)
    assert seg.max() == 1


def test_resize_data_all_cases(tmp_path):
    make_dataset_dir(str(tmp_path / "in"), n_cases=3, shape=(12, 12, 12), channels=2)
    written = resize_data(str(tmp_path / "in"), str(tmp_path / "out"), target_size=(8, 8, 8))
    assert len(written) == 3  # reference bug (stray break) not replicated
    img = hdf5_reader(written[0], "ct")
    assert img.shape == (2, 8, 8, 8)


def test_split_and_resize(tmp_path):
    make_dataset_dir(str(tmp_path / "in"), n_cases=5, shape=(12, 12, 12), channels=2)
    train, test = split_and_resize_data(
        str(tmp_path / "in"), str(tmp_path / "out"), target_size=(8, 8, 8), retain=2
    )
    assert len(train) == 3 and len(test) == 2
    assert os.path.isdir(str(tmp_path / "out" / "train"))


def test_patient_path_helpers(tmp_path):
    """converter/utils.py:10-70 equivalents: patient file tuples + split."""
    import json

    from hdenseformer_tpu.data.convert import (
        get_paths_to_patient_files,
        get_train_val_paths,
    )

    for pid in ["CHUM001", "CHUM002", "CHUV003"]:
        d = tmp_path / pid
        d.mkdir()
        for suffix in ["_ct.nii.gz", "_pt.nii.gz", "_ct_gtvt.nii.gz"]:
            (d / (pid + suffix)).write_bytes(b"")
    paths = get_paths_to_patient_files(str(tmp_path), append_mask=True)
    assert len(paths) == 3 and all(len(p) == 3 for p in paths)
    assert paths[0][0].endswith("CHUM001_ct.nii.gz")
    assert paths[0][2].endswith("CHUM001_ct_gtvt.nii.gz")
    no_mask = get_paths_to_patient_files(str(tmp_path), append_mask=False)
    assert all(len(p) == 2 for p in no_mask)

    split_file = tmp_path / "split.json"
    split_file.write_text(
        json.dumps({"train": ["CHUM001", "CHUV003"], "val": ["CHUM002"]})
    )
    train, val = get_train_val_paths(paths, str(split_file))
    assert len(train) == 2 and len(val) == 1
    assert val[0][0].endswith("CHUM002_ct.nii.gz")


def test_resample_bspline_interpolator():
    """'bspline' mirrors sitk.sitkBSpline: exact on affine ramps, smooth
    elsewhere; unknown names raise."""
    import numpy as np
    import pytest as _pytest

    from hdenseformer_tpu.data.convert import resample_image

    z, y, x = np.meshgrid(np.arange(8.0), np.arange(8.0), np.arange(8.0),
                          indexing="ij")
    ramp = (2 * z + 3 * y - x).astype(np.float32)
    out_b, sp = resample_image(ramp, (1, 1, 1), new_size=(16, 16, 16),
                               interpolator="bspline")
    out_l, _ = resample_image(ramp, (1, 1, 1), new_size=(16, 16, 16),
                              interpolator="linear")
    assert out_b.shape == (16, 16, 16)
    assert sp == (0.5, 0.5, 0.5)
    # cubic splines reproduce affine functions exactly (away from the
    # clamped border); linear agrees there too
    np.testing.assert_allclose(out_b[4:-4, 4:-4, 4:-4],
                               out_l[4:-4, 4:-4, 4:-4], rtol=5e-3, atol=0.1)
    with _pytest.raises(ValueError, match="interpolator"):
        resample_image(ramp, (1, 1, 1), new_size=(4, 4, 4), interpolator="sinc")


def test_resample_interpolator_family():
    """Full sitk-style interpolator surface (ref converter/utils.py:120-141):
    gaussian / label_gaussian / windowed-sinc kernels resample correctly."""
    import numpy as np
    from hdenseformer_tpu.data.convert import resample_image

    rng = np.random.default_rng(0)
    a = rng.standard_normal((12, 14, 16)).astype(np.float32)
    # corner-aligned identity: same-size sinc resample returns the input
    for interp in ("lanczos_sinc", "hamming_sinc", "cosine_sinc",
                   "welch_sinc", "blackman_sinc"):
        out, sp = resample_image(a, (1, 1, 1), new_size=a.shape, interpolator=interp)
        np.testing.assert_allclose(out, a, atol=1e-4), interp
        assert sp == (1.0, 1.0, 1.0)
    # gaussian preserves constants under any size change
    c = np.full((10, 10, 10), 2.5, np.float32)
    out, _ = resample_image(c, (1, 1, 1), new_size=(7, 9, 11), interpolator="gaussian")
    assert out.shape == (7, 9, 11)
    np.testing.assert_allclose(out, 2.5, atol=1e-5)
    # label_gaussian emits only input labels, keeps dtype
    lab = rng.integers(0, 3, (12, 12, 12)).astype(np.int16)
    out, _ = resample_image(lab, (1, 1, 1), new_size=(6, 6, 6), interpolator="label_gaussian")
    assert set(np.unique(out)) <= {0, 1, 2} and out.dtype == np.int16
    # smooth data: lanczos agrees with linear to a few percent
    ramp = np.linspace(0, 1, 20, dtype=np.float32)[:, None, None] * np.ones((1, 8, 8), np.float32)
    o1, _ = resample_image(ramp, (1, 1, 1), new_size=(13, 5, 5), interpolator="lanczos_sinc")
    o2, _ = resample_image(ramp, (1, 1, 1), new_size=(13, 5, 5), interpolator="linear")
    assert np.abs(o1 - o2).max() < 0.06
    # unknown interpolator raises with the option list
    try:
        resample_image(a, (1, 1, 1), new_size=(4, 4, 4), interpolator="nope")
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "lanczos_sinc" in str(e)

"""CLI argument parsing and config construction (no device work)."""
import pytest

from hdenseformer_tpu.cli import build_parser, make_config


def parse(argv):
    return build_parser().parse_args(argv)


def test_default_mode_train_cross():
    args = parse([])
    assert args.mode == "train-cross"


def test_all_modes_accepted():
    for m in ["train", "train-cross", "inf-sw", "predict-2d", "eval", "convert"]:
        assert parse(["-m", m]).mode == m


def test_bad_mode_rejected():
    with pytest.raises(SystemExit):
        parse(["-m", "bogus"])


def test_config_overrides_flow():
    args = parse([
        "-m", "train", "--dataset", "Hecktor21", "--net", "HDenseFormer_32",
        "--data-path", "/data/x", "--epochs", "7", "--batch-size", "3",
        "--lr", "5e-4", "--input-shape", "64", "64", "64",
        "--step-size", "32", "32", "32", "--transformer-depth", "12",
        "--folds", "3", "--seed", "11", "--no-bf16",
    ])
    cfg = make_config(args)
    assert cfg.n_epoch == 7
    assert cfg.batch_size == 3
    assert cfg.lr == pytest.approx(5e-4)
    assert cfg.input_shape == (64, 64, 64)
    assert cfg.patch_size == (64, 64, 64)  # 3-d input shape sets the patch
    assert cfg.step_size == (32, 32, 32)
    assert cfg.transformer_depth == 12
    assert cfg.fold_num == 3
    assert cfg.seed == 11
    assert cfg.use_fp16 is False


def test_2d_input_shape_does_not_override_patch():
    args = parse(["-m", "train", "--net", "HDenseFormer_2D_32",
                  "--input-shape", "384", "384"])
    cfg = make_config(args)
    assert cfg.input_shape == (384, 384)
    assert len(cfg.patch_size) == 3  # untouched 3-d default


def test_net_name_sets_mode():
    cfg2d = make_config(parse(["--net", "unet", "--encoder", "resnet18"]))
    assert cfg2d.mode == "2d_seg"
    assert cfg2d.batch_size == 24
    cfg3d = make_config(parse(["--net", "HDenseFormer_32"]))
    assert cfg3d.mode == "3d_seg"
    assert cfg3d.batch_size == 2

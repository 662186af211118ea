"""CLI entry point: train / train-cross / inf-sw / eval / convert.

Mirrors the reference's ``python run.py -m {train,train-cross,inf-sw}``
(run.py:51-122) with the same fold loop and reporting, plus the offline
modes the reference keeps as separate scripts (eval.py, converter/).

Usage:
    python -m hdenseformer_tpu.cli -m train-cross --dataset Hecktor21 \
        --net HDenseFormer_32 --data-path ./dataset/hecktor
"""
from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="hdenseformer_tpu")
    p.add_argument(
        "-m", "--mode", default="train-cross",
        choices=["train", "train-cross", "inf-sw", "predict-2d", "eval", "convert"],
    )
    p.add_argument("--dataset", default="Hecktor21")
    p.add_argument("--net", dest="net_name", default=None)
    p.add_argument("--encoder", dest="encoder_name", default=None)
    p.add_argument("--data-path", default=None)
    p.add_argument("--test-path", default=None)
    p.add_argument("--save-path", default=None)
    p.add_argument("--version", default="v1.0")
    p.add_argument("--fold", type=int, default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--n-devices", type=int, default=None)
    p.add_argument("--no-bf16", action="store_true")
    p.add_argument("--input-shape", type=int, nargs="+", default=None,
                   help="override the preset input/patch shape, e.g. 144 144 144")
    p.add_argument("--step-size", type=int, nargs="+", default=None,
                   help="sliding-window step, e.g. 72 72 72")
    p.add_argument("--transformer-depth", type=int, default=None)
    p.add_argument("--folds", type=int, default=None, help="number of CV folds")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="capture a jax.profiler trace of the first training epoch into DIR")
    # inf-sw mode
    p.add_argument("--window-batch", type=int, default=8,
                   help="sliding-window inference: windows per model call")
    p.add_argument("--use-gaussian", action="store_true",
                   help="gaussian importance weighting of window overlaps")
    p.add_argument("--save-nii", action="store_true",
                   help="also save predictions as .nii.gz volumes")
    # convert mode
    p.add_argument("--convert-format", choices=["hecktor", "brats"], default="hecktor")
    p.add_argument("--input-dir", default=None)
    p.add_argument("--output-dir", default=None)
    return p


def make_config(args):
    from hdenseformer_tpu.configs import get_config

    overrides = {"version": args.version}
    if args.net_name:
        overrides["net_name"] = args.net_name
        overrides["mode"] = "2d_seg" if "2D" in args.net_name or args.net_name in (
            "unet", "unet++", "deeplabv3+") else "3d_seg"
    if args.encoder_name:
        overrides["encoder_name"] = args.encoder_name
    if args.data_path:
        overrides["data_path"] = args.data_path
    if args.test_path:
        overrides["test_path"] = args.test_path
    if args.epochs:
        overrides["n_epoch"] = args.epochs
    if args.batch_size:
        overrides["batch_size"] = args.batch_size
    if args.lr:
        overrides["lr"] = args.lr
    if args.fold:
        overrides["current_fold"] = args.fold
    if args.n_devices:
        overrides["n_devices"] = args.n_devices
    if args.no_bf16:
        overrides["use_fp16"] = False
    if args.input_shape:
        overrides["input_shape"] = tuple(args.input_shape)
        if len(args.input_shape) == 3:
            overrides["patch_size"] = tuple(args.input_shape)
    if args.step_size:
        overrides["step_size"] = tuple(args.step_size)
    if args.transformer_depth:
        overrides["transformer_depth"] = args.transformer_depth
    if args.folds:
        overrides["fold_num"] = args.folds
    if args.seed is not None:
        overrides["seed"] = args.seed
    return get_config(args.dataset, **overrides)


def _report_params_flops(seg, cfg):
    """Param/GFLOP report at startup (ref run.py:66-67, 76-78, via XLA
    cost analysis instead of thop)."""
    try:
        import jax.numpy as jnp

        from hdenseformer_tpu.utils import count_flops, count_params

        variables = seg.init_variables()
        n = count_params(variables.get("params", variables))
        print(f"params: {n/1e6:.3f} M")
        x = jnp.zeros((1,) + tuple(cfg.input_shape) + (cfg.channels,), jnp.float32)
        flops = count_flops(lambda xx: seg.model.apply(variables, xx), x)
        if flops:
            print(f"forward GFLOPs: {flops/1e9:.3f}")
    except Exception as e:
        print(f"(param/flop report skipped: {type(e).__name__})")


def run_train(cfg, folds):
    from hdenseformer_tpu.data.pipeline import get_cross_validation_by_sample
    from hdenseformer_tpu.parallel.mesh import maybe_distributed_init
    from hdenseformer_tpu.train.loop import SemanticSeg
    from hdenseformer_tpu.utils import count_params

    maybe_distributed_init()
    path_list = cfg.path_list
    if not path_list:
        raise FileNotFoundError(f"no .hdf5 cases under {cfg.data_path}")
    reported = False
    for current_fold in folds:
        print(f"=== Training Fold {current_fold} ===")
        seg = SemanticSeg(**cfg.init_trainer_kwargs())
        if not reported:
            _report_params_flops(seg, cfg)
            reported = True
        train_path, val_path = get_cross_validation_by_sample(
            path_list, cfg.fold_num, current_fold, shuffle_seed=cfg.seed
        )
        print("Train set length", len(train_path), "Val set length", len(val_path))
        t0 = time.time()
        from hdenseformer_tpu.utils.profiling import profiler_trace

        with profiler_trace(getattr(cfg, "profile_dir", None)):
            seg.trainer(
                train_path=train_path,
                val_path=val_path,
                cur_fold=current_fold,
                **cfg.setup_trainer_kwargs(),
            )
        print(f"run time:{time.time() - t0:.4f}")


def run_inference(cfg, args):
    from hdenseformer_tpu.train.checkpoint import get_weight_path
    from hdenseformer_tpu.train.loop import SemanticSeg

    test_path = args.test_path or cfg.test_path
    for current_fold in range(1, cfg.fold_num + 1):
        print(f"=== Predicting Fold {current_fold} ===")
        ckpt_dir = os.path.join(cfg.output_dir, f"fold{current_fold}")
        weight_path = get_weight_path(ckpt_dir)
        print(weight_path)
        if weight_path is None:
            continue
        kwargs = cfg.init_trainer_kwargs()
        kwargs["weight_path"] = weight_path
        kwargs["pre_trained"] = True
        seg = SemanticSeg(**kwargs)
        save_path = args.save_path or os.path.join(
            cfg.save_root, "3d", cfg.version, f"fold{current_fold}"
        )
        os.makedirs(save_path, exist_ok=True)
        mesh = None
        if cfg.n_devices and cfg.n_devices > 1:
            from hdenseformer_tpu.parallel.mesh import make_mesh

            mesh = make_mesh(cfg.n_devices)
        t0 = time.time()
        seg.inference_slidingwindow(
            test_path, save_path,
            window_batch=args.window_batch, use_gaussian=args.use_gaussian,
            mesh=mesh, save_nii=args.save_nii,
        )
        print(f"run time:{time.time() - t0:.4f}")


def run_predict_2d(cfg, args):
    """Per-slice 2D volumetric prediction (working eval.py replacement)."""
    from hdenseformer_tpu.infer.slices import eval_dir_2d
    from hdenseformer_tpu.train.checkpoint import get_weight_path
    from hdenseformer_tpu.train.loop import SemanticSeg

    ckpt_dir = os.path.join(cfg.output_dir, f"fold{cfg.current_fold}")
    weight_path = get_weight_path(ckpt_dir)
    if weight_path is None:
        raise FileNotFoundError(f"no checkpoint under {ckpt_dir}")
    kwargs = cfg.init_trainer_kwargs()
    kwargs["weight_path"] = weight_path
    kwargs["pre_trained"] = True
    seg = SemanticSeg(**kwargs)
    state = seg.build_state()
    state = seg.load_pretrained(state, weight_path, ckpt_point=False)
    save_path = args.save_path or os.path.join(
        cfg.save_root, "2d", cfg.version, f"fold{cfg.current_fold}"
    )
    written = eval_dir_2d(
        seg.model, state.variables(), args.test_path or cfg.test_path, save_path,
        input_shape=cfg.input_shape, num_classes=cfg.num_classes,
        channels=cfg.channels, img_key=cfg.keys[0], lab_key=cfg.keys[1],
    )
    print(f"wrote {len(written)} prediction volumes to {save_path}")


def run_eval(cfg, args):
    """Offline eval: predicted .npy vs ground truth -> per-case metric CSV."""
    import glob

    from hdenseformer_tpu.data.io import hdf5_reader
    from hdenseformer_tpu.metrics import multi_asd, multi_dice, multi_hd, multi_jc, multi_vs

    pred_dir = args.save_path
    gt_dir = args.test_path or cfg.test_path
    rows = []
    for pred_path in sorted(glob.glob(os.path.join(pred_dir, "*.npy"))):
        case = os.path.basename(pred_path)[:-4]
        gt_path = os.path.join(gt_dir, case + ".hdf5")
        if not os.path.exists(gt_path):
            continue
        pred = np.load(pred_path)
        gt = hdf5_reader(gt_path, cfg.keys[1])
        n_fg = cfg.num_classes - 1
        dice_list, mean_dice = multi_dice(gt, pred, n_fg)
        hd_list, mean_hd = multi_hd(gt, pred, n_fg)
        jc_list, mean_jc = multi_jc(gt, pred, n_fg)
        vs_list, mean_vs = multi_vs(gt, pred, n_fg)
        asd_list, mean_asd = multi_asd(gt, pred, n_fg)
        rows.append(
            dict(case=case, dice=mean_dice, hd95=mean_hd, jaccard=mean_jc,
                 vs=mean_vs, asd=mean_asd, dice_list=dice_list, hd_list=hd_list)
        )
        print(f"{case}: dice={mean_dice} hd95={mean_hd}")
    out_csv = os.path.join(pred_dir, "eval_results.json")
    with open(out_csv, "w") as f:
        json.dump(rows, f, indent=2)
    if rows:
        print("mean dice:", np.nanmean([r["dice"] for r in rows]))
        print("mean hd95:", np.nanmean([r["hd95"] for r in rows]))
    print("wrote", out_csv)


def run_convert(args):
    from hdenseformer_tpu.data.convert import nii2npy_brats, nii2npy_hecktor

    if args.convert_format == "hecktor":
        nii2npy_hecktor(args.input_dir, args.output_dir)
    else:
        nii2npy_brats(args.input_dir, args.output_dir)


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.mode == "convert":
        run_convert(args)
        return
    # persistent XLA compilation cache: only the first-ever process pays a
    # given (program, shape) compile; reruns load the serialized executable
    from hdenseformer_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = make_config(args)
    cfg.profile_dir = args.profile  # type: ignore[attr-defined]
    if args.mode == "train-cross":
        run_train(cfg, range(1, cfg.fold_num + 1))
    elif args.mode == "train":
        run_train(cfg, [cfg.current_fold])
    elif args.mode == "inf-sw":
        run_inference(cfg, args)
    elif args.mode == "predict-2d":
        run_predict_2d(cfg, args)
    elif args.mode == "eval":
        run_eval(cfg, args)


if __name__ == "__main__":
    main()

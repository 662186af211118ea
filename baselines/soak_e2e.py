"""TPU end-to-end soak of the full reference workflow (VERDICT r4 item 6).

Drives the real CLI entry points in-process through the reference's user
journey (run.py:72-120): synthetic HECKTOR-shaped cases -> train-cross
(2 folds x 2 epochs, production config: HDenseFormer_32 144^3 depth 24,
bf16, batch 2) -> checkpoint selection -> inf-sw over every fold's cases
-> eval metric JSONs. Volumes are HETEROGENEOUS shapes on purpose: the
sliding-window lattice padding must serve all of them from a small set
of executables (one per (patch, step) lattice cell).

Wall-clock per phase and final per-fold dice are written to
baselines/soak_e2e_r5.json. This is an integration soak (ckpt naming,
fold plumbing, early-stop, lattice sharing), not a convergence run —
2 epochs on 6 synthetic cases trains nothing meaningful.

Run: python baselines/soak_e2e.py [workdir]
"""
import argparse
import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hdenseformer_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(HERE), "tests"))

# heterogeneous, all in the 144-patch/72-step lattice cells around
# real HECKTOR resampled sizes
SHAPES = [
    (160, 160, 160),
    (144, 176, 160),
    (176, 160, 176),
    (160, 144, 144),
    (200, 168, 176),
    (152, 160, 168),
]


def main():
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/hdf_soak_r5"
    shutil.rmtree(workdir, ignore_errors=True)
    data_dir = os.path.join(workdir, "data")
    os.makedirs(data_dir, exist_ok=True)
    from fixtures import make_case

    for i, shape in enumerate(SHAPES):
        make_case(
            os.path.join(data_dir, f"case{i}_.hdf5"), shape=shape,
            channels=2, num_classes=2, img_key="ct", lab_key="seg", seed=i,
        )

    from hdenseformer_tpu import cli
    from hdenseformer_tpu.configs import get_config

    cfg = get_config(
        "Hecktor21",
        data_path=data_dir,
        test_path=data_dir,
        n_epoch=2,
        fold_num=2,
        version="soak_r5",
        ckpt_root=os.path.join(workdir, "ckpt"),
        log_root=os.path.join(workdir, "log"),
        save_root=os.path.join(workdir, "segout"),
    )
    cfg.profile_dir = None
    log = {"config": {"net": cfg.net_name, "input_shape": cfg.input_shape,
                      "batch_size": cfg.batch_size, "folds": cfg.fold_num,
                      "epochs": cfg.n_epoch, "use_fp16": cfg.use_fp16,
                      "remat": cfg.remat,
                      "shapes": SHAPES},
           "phases": {}}

    t0 = time.time()
    cli.run_train(cfg, range(1, cfg.fold_num + 1))
    log["phases"]["train_cross_s"] = round(time.time() - t0, 1)
    print("TRAIN DONE", log["phases"], flush=True)

    args = argparse.Namespace(
        test_path=data_dir, save_path=None, window_batch=8,
        use_gaussian=False, save_nii=False,
    )
    t0 = time.time()
    cli.run_inference(cfg, args)
    log["phases"]["inf_sw_s"] = round(time.time() - t0, 1)
    print("INFERENCE DONE", log["phases"], flush=True)

    t0 = time.time()
    per_fold = {}
    for fold in range(1, cfg.fold_num + 1):
        save_path = os.path.join(cfg.save_root, "3d", cfg.version, f"fold{fold}")
        eval_args = argparse.Namespace(save_path=save_path, test_path=data_dir)
        cli.run_eval(cfg, eval_args)
        with open(os.path.join(save_path, "eval_results.json")) as f:
            rows = json.load(f)
        per_fold[f"fold{fold}"] = {
            "n_cases": len(rows),
            "mean_dice": round(float(np.nanmean([r["dice"] for r in rows])), 4)
            if rows else None,
        }
    log["phases"]["eval_s"] = round(time.time() - t0, 1)
    log["per_fold"] = per_fold
    # integration checks: every case predicted in every fold
    for fold in range(1, cfg.fold_num + 1):
        save_path = os.path.join(cfg.save_root, "3d", cfg.version, f"fold{fold}")
        preds = glob.glob(os.path.join(save_path, "*.npy"))
        assert len(preds) == len(SHAPES), (fold, preds)
    out = os.path.join(HERE, "soak_e2e_r5.json")
    with open(out, "w") as f:
        json.dump(log, f, indent=2)
    print(json.dumps(log))


if __name__ == "__main__":
    main()

"""Gaussian importance-map A/B (VERDICT r4 item 8).

The gaussian window weighting is dead code in the reference
(trainer.py:566-576 computes the map, then accumulates uniformly); here
it is a live ``use_gaussian`` flag (infer/sliding.py), default OFF for
parity. This A/B puts data behind the default:

1. ACCURACY: train HDenseFormer_16 (depth 4, 32^3 patch, bf16) for 60
   steps on random crops of a synthetic blob volume (the PARITY.md
   hardware-convergence protocol, dice ~0.94 in 40 steps), then run
   sliding-window inference over the full 64^3 volume (patch 32, step
   16 — 27 overlapping windows) with gaussian ON vs OFF and compare
   whole-volume dice against the ground-truth blob.
2. COST: p50 of predict_volume at the production scale (HDenseFormer_32
   depth 24, 200^3 volume, patch 144^3, step 72^3, wb8), gaussian ON vs
   OFF — the map multiplies every window's probabilities before the
   scatter-add.

Recorded in baselines/infer_latency_v5e.json (round 5).

Run: python baselines/ab_r5_gaussian.py [--skip-cost]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hdenseformer_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from hdenseformer_tpu.infer.sliding import predict_volume
from hdenseformer_tpu.losses import get_loss
from hdenseformer_tpu.models import get_net
from hdenseformer_tpu.train.loop import make_train_step
from hdenseformer_tpu.train.state import TrainState, get_optimizer


def make_blob_volume(size=64, channels=2, seed=0):
    rng = np.random.RandomState(seed)
    lab = np.zeros((size,) * 3, np.float32)
    for _ in range(4):
        c = rng.randint(12, size - 12, 3)
        r = rng.randint(6, 11)
        g = np.ogrid[:size, :size, :size]
        d = sum((gi - ci) ** 2 for gi, ci in zip(g, c))
        lab[d <= r * r] = 1.0
    img = np.stack(
        [lab * 2.0 - 1.0 + 0.3 * rng.randn(size, size, size) for _ in range(channels)],
        0,
    ).astype(np.float32)
    return img, lab


def accuracy_ab():
    size, patch, step_sz = 64, (32, 32, 32), (16, 16, 16)
    img, lab = make_blob_volume(size)
    model = get_net(
        "HDenseFormer_16", channels=2, num_classes=2, input_shape=patch,
        transformer_depth=4, dtype=jnp.bfloat16, remat=False,
    )
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng}, jnp.zeros((1,) + patch + (2,)))
    tx = get_optimizer("Adam", 1e-3, weight_decay=1e-4)
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"], tx=tx, model_state={}
    )
    step = make_train_step(get_loss("FocalLoss", use_ds=True), num_classes=2)
    rs = np.random.RandomState(1)
    for i in range(60):
        o = [rs.randint(0, size - 32 + 1) for _ in range(3)]
        crop_img = img[:, o[0]:o[0]+32, o[1]:o[1]+32, o[2]:o[2]+32]
        crop_lab = lab[o[0]:o[0]+32, o[1]:o[1]+32, o[2]:o[2]+32]
        oh = np.stack([1 - crop_lab, crop_lab], -1)[None]
        batch = {
            "image": jnp.asarray(np.moveaxis(crop_img, 0, -1))[None],
            "label": jnp.asarray(oh),
        }
        state, m = step(state, batch, rng)
    print("final train loss:", float(m["loss"]), flush=True)

    vars_final = {"params": state.params, **state.model_state}
    out = {}
    for g in (False, True):
        pred = predict_volume(
            model, vars_final, img, patch, step_sz, 2,
            use_gaussian=g, window_batch=8,
        )
        inter = np.sum((pred == 1) & (lab == 1))
        dice = (2.0 * inter + 1e-5) / (np.sum(pred == 1) + np.sum(lab == 1) + 1e-5)
        out["gaussian_on" if g else "gaussian_off"] = {"dice": round(float(dice), 5)}
        print("accuracy", g, out["gaussian_on" if g else "gaussian_off"], flush=True)
    return out


def cost_ab(reps=5):
    patch, step_sz = (144, 144, 144), (72, 72, 72)
    model = get_net(
        "HDenseFormer_32", channels=2, num_classes=2, input_shape=patch,
        transformer_depth=24, dtype=jnp.bfloat16, remat=False,
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1,) + patch + (2,))
    )
    img = np.random.RandomState(0).randn(2, 200, 200, 200).astype(np.float32)
    out = {}
    for g in (False, True):
        key = "gaussian_on" if g else "gaussian_off"
        t0 = time.perf_counter()
        predict_volume(model, variables, img, patch, step_sz, 2,
                       use_gaussian=g, window_batch=8)
        first = time.perf_counter() - t0
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            predict_volume(model, variables, img, patch, step_sz, 2,
                           use_gaussian=g, window_batch=8)
            times.append(time.perf_counter() - t0)
        out[key] = {
            "first_s": round(first, 2),
            "p50_s": round(float(np.median(times)), 3),
            "min_s": round(min(times), 3),
        }
        print("cost", key, out[key], flush=True)
    return out


def main():
    res = {"accuracy_64cube_patch32_step16": accuracy_ab()}
    if "--skip-cost" not in sys.argv:
        res["cost_200cube_patch144_wb8"] = cost_ab()
    print(json.dumps(res))


if __name__ == "__main__":
    main()

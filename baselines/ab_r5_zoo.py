"""Round-5 same-process TPU A/Bs for the remaining zoo stragglers
(VERDICT r4 items 4 and 5).

Protocol: bench_zoo.py volumes (TransBTS 128^3, Hecktor20Top1 144^3,
2 channels, bf16, b1, FocalLoss no-DS), REPS chained windows of STEPS
steps per arm, BEST window reported (relay-contention robust, same
rationale as bench.py round 5). First losses asserted equal across the
arms of each model (packed == fine math, tests/test_s2d.py).

TransBTS arms (reference models/TransBTS/Unet_skipconnection.py:71-111 —
its 16/32-channel full-resolution encoder levels are the exact sub-MXU-
lane profile where s2d bought 1.96-2.45x elsewhere; its GN+ReLU chains
run packed via ops/s2d.py::group_norm_relu_packed):
  transbts_off    s2d=False          fine-grid reference arm
  transbts_auto   s2d=None           levels 0+1 full-rank packed
  transbts_l0     s2d={0: True}      level 0 only
  transbts_hw     s2d={0:(1,2),1:(1,2)}  partial-rank H,W (128-lane)

Hecktor20Top1 arms (reference models/Hecktor20Top1/model.py:44-85;
round-4 point was 496 ms/step = level-1 packed with a FINE k7 stem):
  hecktor_r4      s2d=True           round-5 code: k7 stem now packed
                                     (ops/s2d.py::convk_packed)
  hecktor_l2      s2d={1:True,2:(2,)}  + level-2 last-dim partial-rank
  hecktor_off     s2d=False          fine reference arm

Run: python baselines/ab_r5_zoo.py [transbts hecktor ...]
Results recorded in PARITY.md (round 5).
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

from hdenseformer_tpu.losses import get_loss
from hdenseformer_tpu.models import get_net
from hdenseformer_tpu.train.loop import make_train_step
from hdenseformer_tpu.train.state import TrainState, get_optimizer

STEPS = 8
REPS = 3

TRANSBTS_ARMS = {
    "off": False,
    "auto": None,
    "l0": {0: True},
    "hw": {0: (1, 2), 1: (1, 2)},
}
HECKTOR_ARMS = {
    "off": False,
    "r4": True,
    "l2": {1: True, 2: (2,)},
}


def measure(model):
    vol = None
    rng = jax.random.PRNGKey(0)
    # volume is implied by the model config the caller built
    vol = measure.vol
    x = jnp.zeros((1,) + vol + (2,), jnp.float32)
    y = jnp.zeros((1,) + vol + (2,), jnp.float32).at[..., 0].set(1.0)
    variables = model.init({"params": rng}, x)
    model_state = {k: v for k, v in variables.items() if k != "params"}
    tx = get_optimizer("Adam", 1e-3, weight_decay=1e-4)
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"], tx=tx,
        model_state=model_state,
    )
    criterion = get_loss("FocalLoss", use_ds=False)
    step = make_train_step(criterion, num_classes=2)
    batch = {"image": x, "label": y}
    t0 = time.perf_counter()
    state, m = step(state, batch, rng)
    loss0 = float(m["loss"])
    first_s = time.perf_counter() - t0
    windows = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        for _ in range(STEPS):
            state, m = step(state, batch, rng)
        float(m["loss"])
        windows.append((time.perf_counter() - t0) / STEPS)
    return {
        "ms_per_step": round(min(windows) * 1e3, 1),
        "windows_ms": [round(w * 1e3, 1) for w in windows],
        "first_loss": loss0,
        "first_call_s": round(first_s, 1),
    }


def run_family(name, vol, arms, extra):
    out = {}
    base = None
    for arm, s2d in arms.items():
        measure.vol = vol
        model = get_net(
            name, channels=2, num_classes=2, input_shape=vol,
            dtype=jnp.bfloat16, s2d=s2d, **extra,
        )
        out[arm] = measure(model)
        print(name, arm, out[arm], flush=True)
        if base is None:
            base = out[arm]["first_loss"]
        else:
            assert abs(out[arm]["first_loss"] - base) < 2e-2 * max(
                1.0, abs(base)
            ), (arm, out[arm]["first_loss"], base)
    return out


def main():
    # 'transbts' runs every arm; 'transbts:off,auto' selects arms (cold
    # XLA compiles through the relay cost 10-35 min EACH this round, so
    # arm selection is the difference between an A/B and a timeout)
    which = sys.argv[1:] or ["transbts", "hecktor"]
    out = {}
    for w in which:
        fam, _, sel = w.partition(":")
        keys = sel.split(",") if sel else None
        if fam == "transbts":
            arms = TRANSBTS_ARMS
            args = ("TransBTS", (128, 128, 128), {})
        elif fam == "hecktor":
            arms = HECKTOR_ARMS
            args = ("hecktor20top1", (144, 144, 144), {"remat": True})
        else:
            raise SystemExit(f"unknown family {fam}")
        if keys:
            arms = {k: arms[k] for k in keys}
        out[fam] = run_family(args[0], args[1], arms, args[2])
    print(json.dumps(out))


if __name__ == "__main__":
    main()



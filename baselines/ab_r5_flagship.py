"""Round-5 same-process TPU A/Bs for the flagship train step.

Protocol identical to baselines/ab_r4_zoo.py / bench.py: HDenseFormer_32,
144^3 x 2 modalities, depth 24, b1, bf16, remat=False, FocalLoss(DS) —
the headline configuration — with REPS chained windows of STEPS steps per
arm and the BEST window reported (relay-contention robust, same rationale
as bench.py round 5).

Arms (selected on the command line):
  auto       s2d=None        — round-4 operating point: level 0 (32ch)
                               full-rank packed, 144^3x32 -> 72^3x256,
                               2.37x FLOP redundancy (64/27 dense taps).
  hw         s2d={0: (1,2)}  — partial-rank: pack H,W only ->
                               (144,72,72)x128. 128 lanes = exactly one
                               MXU tile, 1.78x redundancy (48/27) = 25%
                               fewer level-0 conv FLOPs than full-rank.
  dh         s2d={0: (0,1)}  — same rank, D,H packed (layout control:
                               keeps the last spatial dim fine).
  off        s2d=False       — fine-grid reference arm.
  l1w        s2d={0:True,1:(2,)} — round-3's 64ch last-dim partial-rank
                               retest at the round-5 operating point.

First losses are asserted to agree across arms to bf16 accumulation
tolerance (f32 packed==fine is exact, tests/test_s2d.py).

Run: python baselines/ab_r5_flagship.py auto hw [dh off l1w]
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

VOL = (144, 144, 144)
DEPTH = 24
STEPS = 8
REPS = 3

ARMS = {
    "auto": None,
    "hw": {0: (1, 2)},
    "dh": {0: (0, 1)},
    "off": False,
    "l1w": {0: True, 1: (2,)},
}


def measure(s2d):
    model = get_net(
        "HDenseFormer_32", channels=2, num_classes=2, input_shape=VOL,
        transformer_depth=DEPTH, dtype=jnp.bfloat16, remat=False, s2d=s2d,
    )
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1,) + VOL + (2,), jnp.float32)
    y = jnp.zeros((1,) + VOL + (2,), jnp.float32).at[..., 0].set(1.0)
    variables = model.init({"params": rng}, x)
    tx = get_optimizer("Adam", 1e-3, weight_decay=1e-4)
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"], tx=tx, model_state={}
    )
    criterion = get_loss("FocalLoss", use_ds=True)
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


def main():
    arms = sys.argv[1:] or ["auto", "hw"]
    out = {}
    base_loss = None
    for a in arms:
        out[a] = measure(ARMS[a])
        print(a, out[a], flush=True)
        if base_loss is None:
            base_loss = out[a]["first_loss"]
        else:
            assert abs(out[a]["first_loss"] - base_loss) < 2e-2 * max(
                1.0, abs(base_loss)
            ), (a, out[a]["first_loss"], base_loss)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

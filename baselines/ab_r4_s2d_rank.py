"""Same-process TPU A/B: s2d packing RANK on the flagship's level 0.

Hypothesis (round-4 frontier work, VERDICT r3 item 3): full-rank
packing (dims (0,1,2)) puts 32ch levels at 256 lanes with 2.37x FLOP
redundancy (64 dense / 27 useful taps); a rank-2 pack of the two minor
spatial dims ({0: (1, 2)}) hits EXACTLY the 128 MXU lanes at only
(4/3)^2 = 1.78x redundancy — the z axis keeps its exact 3-tap SAME
conv. If the MXU is equally saturated at 128 contracting lanes, level-0
conv math drops ~25%, and the shifted-layout machinery shrinks to two
padded dims.

Protocol identical to bench.py (HDenseFormer_32, 144^3, b1, depth 24,
bf16, remat off, FocalLoss+DS; 8 chained steps, one float() sync).
First losses asserted to agree to bf16 rounding.

Run: python baselines/ab_r4_s2d_rank.py [variant ...]
Variants: auto | l0_yx | l0_yx_l1_x | l0_x
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

SPECS = {
    "auto": None,                      # full-rank <=32ch (round-3 default)
    "l0_yx": {0: (1, 2)},              # 128 lanes, 1.78x redundancy
    "l0_yx_l1_x": {0: (1, 2), 1: (2,)},
    "l0_yx_l1_yx": {0: (1, 2), 1: (1, 2)},
    "l0_x": {0: (2,)},                 # 64 lanes, 1.33x (expected loser)
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
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        tx=get_optimizer("Adam", 1e-3, weight_decay=1e-4), model_state={},
    )
    criterion = get_loss("FocalLoss", use_ds=True)
    step = make_train_step(criterion, num_classes=2)
    batch = {"image": x, "label": y}
    t0 = time.perf_counter()
    state, m = step(state, batch, rng)
    loss0 = float(m["loss"])
    first = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, m = step(state, batch, rng)
    float(m["loss"])
    dt = (time.perf_counter() - t0) / STEPS
    return dt, loss0, first


def main():
    variants = sys.argv[1:] or ["auto", "l0_yx"]
    out = {}
    ref_loss = None
    for v in variants:
        dt, loss0, first = measure(SPECS[v])
        out[v] = {
            "ms_per_step": round(dt * 1e3, 1),
            "first_loss": loss0,
            "first_call_s": round(first, 1),
        }
        print(v, out[v], flush=True)
        if ref_loss is None:
            ref_loss = loss0
        else:
            assert abs(loss0 - ref_loss) < 2e-2 * max(1.0, abs(ref_loss))
    print(json.dumps(out))


if __name__ == "__main__":
    main()

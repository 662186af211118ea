"""Round-5 isolating A/B for the lattice-padding p50 regression
(VERDICT r4 item 3).

Round 4 recorded 200^3 wb8 steady-state p50 going 3.446 s (r3, unpadded)
-> 5.712 s (r4, lattice-padded to 216^3) and attributed it — unmeasured —
to "padded-accumulator + transfer overhead and run-to-run relay
variance". This script separates the suspects in ONE process:

  arms: pad_to_lattice = False | True, each repeated REPS times after a
  warmup call; p50 and min reported per arm. Run it once on the round-4
  code and once on the round-5 fix (in-executable argmax + uint8
  transfer + no count accumulator, infer/sliding.py) to attribute the
  regression between (a) the padded accumulator itself and (b) the
  op-by-op finalize + 40 MB int32 host transfer the padding amplified.

Model: HDenseFormer_32 depth 24 bf16 (the production inference config,
baselines/infer_bench_r4.py protocol), volume 200^3 x 2ch, patch 144^3,
step 72^3, wb8.

Run: python baselines/ab_r5_lattice.py [reps]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hdenseformer_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax.numpy as jnp
import numpy as np

import jax
from hdenseformer_tpu.infer.sliding import predict_volume
from hdenseformer_tpu.models import get_net

VOL = (200, 200, 200)
PATCH = (144, 144, 144)
STEP = (72, 72, 72)
WB = 8


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    model = get_net(
        "HDenseFormer_32", channels=2, num_classes=2, input_shape=PATCH,
        transformer_depth=24, dtype=jnp.bfloat16, remat=False,
    )
    x = jnp.zeros((1,) + PATCH + (2,), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x)
    img = np.random.RandomState(0).randn(2, *VOL).astype(np.float32)

    out = {}
    preds = {}
    for pad in (False, True):
        key = "lattice" if pad else "unpadded"
        t0 = time.perf_counter()
        preds[key] = predict_volume(
            model, variables, img, PATCH, STEP, 2,
            window_batch=WB, pad_to_lattice=pad,
        )
        first = time.perf_counter() - t0
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            predict_volume(
                model, variables, img, PATCH, STEP, 2,
                window_batch=WB, pad_to_lattice=pad,
            )
            times.append(time.perf_counter() - t0)
        out[key] = {
            "first_s": round(first, 2),
            "p50_s": round(float(np.median(times)), 3),
            "min_s": round(min(times), 3),
            "times_s": [round(t, 3) for t in times],
        }
        print(key, out[key], flush=True)
    assert np.array_equal(preds["lattice"], preds["unpadded"])
    out["p50_ratio_lattice_over_unpadded"] = round(
        out["lattice"]["p50_s"] / out["unpadded"]["p50_s"], 3
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""Round-4 sliding-window measurements (VERDICT r3 item 6).

- 144^3 re-measured at wb4 AND wb8 (the round-1 1.24 s figure was wb1;
  README previously mislabeled it). Both now exercise predict_volume's
  wb clamp: a single-window volume runs wb=1 regardless of the setting
  (before the clamp, wb4 padded the origin list with 3 zero-weight
  dummy windows and measured 1.80 s vs wb1's 1.24 s — pure waste).
- 200^3 re-measured at wb8 with the new (patch, step) lattice padding.
- Executable sharing demonstrated: a 190x198x214 volume pads to the
  SAME lattice shape (216^3, 8 windows) as 200^3, so its first call must
  pay NO new compile (seconds, not minutes).

Run: python baselines/infer_bench_r4.py   (updates nothing; paste the
JSON into infer_latency_v5e.json under "round4")
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
from hdenseformer_tpu.models import get_net

PATCH = (144, 144, 144)
STEP = (72, 72, 72)


def run_case(model, variables, vol_shape, wb, repeats=3):
    img = np.random.RandomState(0).rand(2, *vol_shape).astype(np.float32)
    t0 = time.perf_counter()
    pred = predict_volume(model, variables, img, PATCH, STEP, 2,
                          window_batch=wb)
    first = time.perf_counter() - t0
    assert pred.shape == tuple(vol_shape)
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        predict_volume(model, variables, img, PATCH, STEP, 2, window_batch=wb)
        times.append(time.perf_counter() - t0)
    return {"first_call_s": round(first, 2),
            "p50_s": round(sorted(times)[len(times) // 2], 3)}


def main():
    model = get_net("HDenseFormer_32", channels=2, num_classes=2,
                    input_shape=PATCH, transformer_depth=24,
                    dtype=jnp.bfloat16, remat=False)
    x = jnp.zeros((1,) + PATCH + (2,), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x)

    out = {}
    out["volume_144_wb4"] = run_case(model, variables, (144, 144, 144), 4)
    print(json.dumps(out), flush=True)
    out["volume_144_wb8"] = run_case(model, variables, (144, 144, 144), 8)
    print(json.dumps(out), flush=True)
    out["volume_200_wb8"] = run_case(model, variables, (200, 200, 200), 8)
    print(json.dumps(out), flush=True)
    # same lattice cell as 200^3: every dim in (144..216] has k=1 ->
    # padded 216^3, 2x2x2 = 8 windows -> identical executable
    out["volume_190x198x214_wb8_shared_executable"] = run_case(
        model, variables, (190, 198, 214), 8, repeats=1
    )
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()

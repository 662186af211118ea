"""Realistic-shape multi-device evidence (VERDICT r2 item 8).

The driver's dryrun exercises the full dp+sp program at toy shapes
(32^3 / depth 8); this script runs the SAME sharded train step at a
realistic shape — 64^3, transformer_depth 12, global batch 8 with
per-device batch 1 — on an 8-device virtual CPU mesh, including one
pad-and-mask remainder batch (global batch 5). It demonstrates the
multi-chip program compiles AND executes at depth/shape realism, not
just toy scale (reference scale context: config.py:70,77,120).

Run: python baselines/multichip_realistic.py
Results recorded in baselines/profile_notes.md.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

prev = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in prev:
    prev = (prev + " --xla_force_host_platform_device_count=8").strip()
# 8 virtual devices time-share this host's core(s): threads reach each
# all-reduce far apart, tripping XLA:CPU's default 40 s rendezvous
# termination. Scale the timeout to the realistic per-device workload.
prev += (
    " --xla_cpu_collective_call_warn_stuck_timeout_seconds=600"
    " --xla_cpu_collective_call_terminate_timeout_seconds=3600"
)
os.environ["XLA_FLAGS"] = prev
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from hdenseformer_tpu.losses import get_loss  # noqa: E402
from hdenseformer_tpu.models import get_net  # noqa: E402
from hdenseformer_tpu.parallel.mesh import make_mesh, shard_batch  # noqa: E402
from hdenseformer_tpu.train.loop import make_train_step, pad_and_mask_batch  # noqa: E402
from hdenseformer_tpu.train.state import TrainState, get_optimizer  # noqa: E402


def main():
    vol = (64, 64, 64)
    n_dev = len(jax.devices())
    assert n_dev == 8, jax.devices()
    mesh = make_mesh(n_dev)
    model = get_net(
        "HDenseFormer_32", channels=2, num_classes=2, input_shape=vol,
        transformer_depth=12, dtype=jnp.bfloat16, remat=False,
    )
    rng = jax.random.PRNGKey(0)
    x = np.random.RandomState(0).rand(n_dev, *vol, 2).astype(np.float32)
    y = np.zeros((n_dev,) + vol + (2,), np.float32)
    y[..., 0] = 1.0
    variables = model.init({"params": rng}, jnp.asarray(x[:1]))
    tx = get_optimizer("Adam", 1e-3, weight_decay=1e-4)
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"], tx=tx, model_state={}
    )
    criterion = get_loss("FocalLoss", use_ds=True)
    step = make_train_step(criterion, num_classes=2)

    batch = shard_batch(mesh, {"image": x, "label": y})
    t0 = time.perf_counter()
    state, metrics = step(state, batch, rng)
    jax.block_until_ready(metrics["loss"])
    compile_s = time.perf_counter() - t0
    losses = [float(metrics["loss"])]

    t0 = time.perf_counter()
    for _ in range(2):
        state, metrics = step(state, batch, rng)
    jax.block_until_ready(metrics["loss"])
    step_s = (time.perf_counter() - t0) / 2
    losses.append(float(metrics["loss"]))

    # remainder batch (5 of 8) through the production pad-and-mask path:
    # same static shape => no recompile, padding masked out of the loss
    pbatch = pad_and_mask_batch(
        {"image": x[:5], "label": y[:5]}, n_dev, mesh
    )
    t0 = time.perf_counter()
    state, metrics = step(state, pbatch, rng)
    jax.block_until_ready(metrics["loss"])
    rem_s = time.perf_counter() - t0
    losses.append(float(metrics["loss"]))

    assert all(np.isfinite(losses)), losses
    print(json.dumps({
        "devices": n_dev,
        "vol": vol,
        "transformer_depth": 12,
        "per_device_batch": 1,
        "compile_s": round(compile_s, 1),
        "step_s_cpu": round(step_s, 2),
        "remainder_step_s_cpu": round(rem_s, 2),
        "losses": [round(l, 4) for l in losses],
    }))


if __name__ == "__main__":
    main()

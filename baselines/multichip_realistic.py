"""Realistic-shape multi-device evidence (VERDICT r2 item 8 / r3 item 2).

The driver's dryrun exercises the full dp+sp program at toy scale
(HDenseFormer_16, 32^3, depth 4); this script runs the SAME sharded
train step at the largest shape this 1-core host can execute in
minutes — HDenseFormer_32, 48^3, transformer_depth 8, global batch 8
with per-device batch 1 — on an 8-device virtual CPU mesh, including
one pad-and-mask remainder batch (global batch 5). It demonstrates the
multi-chip program compiles AND executes beyond toy scale (reference
scale context: config.py:70,77,120). The round-3 version of this file
targeted 64^3/depth-12 and never completed on this host; this
right-sized version has recorded results in
baselines/profile_notes.md ("multichip_realistic" section).

s2d stays off: the packed layout is a TPU-lane optimization that is
pure redundant FLOPs on CPU, and the packed path's 8-device-mesh
correctness is covered by the pytest suite.

Run: python baselines/multichip_realistic.py
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
from hdenseformer_tpu.parallel.mesh import make_mesh  # noqa: E402
from hdenseformer_tpu.train.loop import make_train_step, pad_and_mask_batch  # noqa: E402
from hdenseformer_tpu.train.state import TrainState, get_optimizer  # noqa: E402


def main():
    vol = (48, 48, 48)
    n_dev = len(jax.devices())
    assert n_dev == 8, jax.devices()
    mesh = make_mesh(n_dev)
    model = get_net(
        "HDenseFormer_32", channels=2, num_classes=2, input_shape=vol,
        transformer_depth=8, dtype=jnp.bfloat16, remat=False, s2d=False,
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

    # full batch via pad_and_mask_batch (weight all ones): ONE pytree for
    # full and remainder batches => ONE train-step compile
    batch = pad_and_mask_batch({"image": x, "label": y}, n_dev, mesh)
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
        "transformer_depth": 8,
        "per_device_batch": 1,
        "compile_s": round(compile_s, 1),
        "step_s_cpu": round(step_s, 2),
        "remainder_step_s_cpu": round(rem_s, 2),
        "losses": [round(l, 4) for l in losses],
    }))


if __name__ == "__main__":
    main()

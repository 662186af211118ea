"""On-TPU training-step benchmark for non-flagship zoo members.

VERDICT r2 item 7: the model zoo had parity/shape tests but no on-chip
throughput numbers. This measures full train steps (fwd + FocalLoss +
bwd + Adam) for UNETR (reference trainer.py:676-694 dispatch) and
TransBTS (trainer.py:668-674) at their reference-scale volumes, printing
one JSON object; results are recorded in PARITY.md.

Usage: python baselines/bench_zoo.py [unetr|transbts|da_unet ...]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


CONFIGS = {
    # net_name, volume, channels, num_classes, use_ds
    "unetr": dict(vol=(96, 96, 96), channels=2, num_classes=2),
    "transbts": dict(vol=(128, 128, 128), channels=2, num_classes=2),
    "da_unet": dict(vol=(144, 144, 144), channels=2, num_classes=2),
    "hecktor20top1": dict(vol=(144, 144, 144), channels=2, num_classes=2),
}
NAMES = {
    "unetr": "unetr",
    "transbts": "TransBTS",
    "da_unet": "da_unet",
    "hecktor20top1": "hecktor20top1",
}
STEPS = 8


def bench_one(key, remat=False):
    import jax
    import jax.numpy as jnp

    from hdenseformer_tpu.losses import get_loss
    from hdenseformer_tpu.models import get_net
    from hdenseformer_tpu.train.loop import make_train_step
    from hdenseformer_tpu.train.state import TrainState, get_optimizer

    cfg = CONFIGS[key]
    vol, ch, ncls = cfg["vol"], cfg["channels"], cfg["num_classes"]
    model = get_net(
        NAMES[key], channels=ch, num_classes=ncls, input_shape=vol,
        dtype=jnp.bfloat16, remat=remat,
    )
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1,) + vol + (ch,), jnp.float32)
    y = jnp.zeros((1,) + vol + (ncls,), jnp.float32).at[..., 0].set(1.0)
    variables = model.init({"params": rng}, x)
    model_state = {k: v for k, v in variables.items() if k != "params"}
    tx = get_optimizer("Adam", 1e-3, weight_decay=1e-4)
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"], tx=tx,
        model_state=model_state,
    )
    criterion = get_loss("FocalLoss", use_ds=False)
    step = make_train_step(criterion, num_classes=ncls)
    batch = {"image": x, "label": y}

    t0 = time.perf_counter()
    state, m = step(state, batch, rng)
    float(m["loss"])  # relay sync: host transfer is the only reliable barrier
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, m = step(state, batch, rng)
    float(m["loss"])
    dt = (time.perf_counter() - t0) / STEPS
    voxels = vol[0] * vol[1] * vol[2]
    return {
        "net": NAMES[key],
        "volume": list(vol),
        "remat": remat,
        "step_s": round(dt, 4),
        "patches_per_sec": round(1.0 / dt, 3),
        "mvox_per_sec": round(voxels / dt / 1e6, 1),
        "first_call_s": round(compile_s, 1),
    }


def main():
    from hdenseformer_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    keys = sys.argv[1:] or ["unetr", "transbts"]
    out = {}
    for k in keys:
        try:
            out[k] = bench_one(k)
        except Exception:
            # HBM OOM at reference-scale volume (the relay surfaces it as
            # an opaque compile-helper HTTP 500): retry checkpointed
            out[k] = bench_one(k, remat=True)
            out[k]["note"] = "remat=False exceeds 16G HBM at this volume"
        print(k, json.dumps(out[k]))  # incremental: survive later failures
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()

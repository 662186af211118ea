"""Same-process TPU A/Bs for the zoo stragglers (VERDICT r3 item 4).

Two levers, protocol identical to bench_zoo.py (144^3, b1, bf16;
8 chained steps, one sync; first losses asserted equal where the math
is identical):

1. maxpool lowering — reduce_window (round-3) vs reshape-max (round-4
   ops/resize.py). Recorded result: DAUNet is FASTER with reduce_window
   (405.7 vs 420.4 ms/step), the opposite of the flagship, so
   models/daunet.py pins ``pool_mode="reduce_window"``; this script
   overrides the field to reproduce the A/B. Hecktor20Top1 uses the
   global flag (utils/flags.py::set_max_pool).

2. hecktor20top1 remat=False — round 3 recorded 613.7 ms/step with
   remat=True because 144^3 exceeded 16G HBM *in a shared process with
   other executables resident* (PARITY.md r3). A fresh process may fit
   remat=False and drop the full recompute overhead. Run this variant
   in its OWN process: ``python baselines/ab_r4_zoo.py hecktor_noremat``.

Each variant builds a fresh train step (fresh jit keeps executables
distinct).

Run: python baselines/ab_r4_zoo.py [da_unet|hecktor20top1|hecktor_noremat ...]
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
from hdenseformer_tpu.models.daunet import da_unet
from hdenseformer_tpu.train.loop import make_train_step
from hdenseformer_tpu.train.state import TrainState, get_optimizer
from hdenseformer_tpu.utils.flags import set_max_pool

VOL = (144, 144, 144)
STEPS = 8


def measure(model):
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1,) + VOL + (2,), jnp.float32)
    y = jnp.zeros((1,) + VOL + (2,), jnp.float32).at[..., 0].set(1.0)
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
    state, m = step(state, batch, rng)
    loss0 = float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, m = step(state, batch, rng)
    float(m["loss"])
    dt = (time.perf_counter() - t0) / STEPS
    return dt, loss0


def build(net, **kw):
    if net == "da_unet":
        return da_unet(
            init_depth=VOL[0], n_channels=2, n_classes=2, dtype=jnp.bfloat16,
            **kw,
        )
    return get_net(
        net, channels=2, num_classes=2, input_shape=VOL,
        dtype=jnp.bfloat16, **kw,
    )


def run_pool_ab(net):
    res = {}
    for mode in ("reduce_window", "reshape"):
        if net == "da_unet":
            model = build(net, pool_mode=mode)
        else:
            set_max_pool(mode)
            model = build(net, remat=True)
        dt, loss0 = measure(model)
        res[mode] = {"ms_per_step": round(dt * 1e3, 1), "first_loss": loss0}
        print(net, mode, res[mode], flush=True)
    res["speedup_reshape"] = round(
        res["reduce_window"]["ms_per_step"] / res["reshape"]["ms_per_step"], 4
    )
    assert abs(res["reduce_window"]["first_loss"] - res["reshape"]["first_loss"]) \
        < 1e-3 * max(1.0, abs(res["reduce_window"]["first_loss"]))
    return res


def run_s2d_ab():
    """Level-0 s2d packing A/B for da_unet (VERDICT r3 item 4: apply the
    flagship's proven lever to the zoo stragglers). bf16 packed-vs-fine
    first losses agree to rounding, not bitwise (tests prove f32 exact)."""
    res = {}
    for s2d in (False, True):
        dt, loss0 = measure(build("da_unet", s2d=s2d))
        key = "s2d_on" if s2d else "s2d_off"
        res[key] = {"ms_per_step": round(dt * 1e3, 1), "first_loss": loss0}
        print("da_unet", key, res[key], flush=True)
    res["speedup_s2d"] = round(
        res["s2d_off"]["ms_per_step"] / res["s2d_on"]["ms_per_step"], 4
    )
    assert abs(res["s2d_off"]["first_loss"] - res["s2d_on"]["first_loss"]) \
        < 2e-2 * max(1.0, abs(res["s2d_off"]["first_loss"]))
    return res


def run_hecktor_s2d_ab():
    """Level-1 s2d packing A/B for Hecktor20Top1 (VERDICT r3 item 4):
    packs the full-resolution 32-channel level (stem k7 stays fine),
    remat=True both arms (the 144^3 production config, PARITY.md r3)."""
    res = {}
    for s2d in (False, True):
        dt, loss0 = measure(build("hecktor20top1", remat=True, s2d=s2d))
        key = "s2d_on" if s2d else "s2d_off"
        res[key] = {"ms_per_step": round(dt * 1e3, 1), "first_loss": loss0}
        print("hecktor20top1", key, res[key], flush=True)
    res["speedup_s2d"] = round(
        res["s2d_off"]["ms_per_step"] / res["s2d_on"]["ms_per_step"], 4
    )
    assert abs(res["s2d_off"]["first_loss"] - res["s2d_on"]["first_loss"]) \
        < 2e-2 * max(1.0, abs(res["s2d_off"]["first_loss"]))
    return res


def main():
    variants = sys.argv[1:] or ["da_unet", "hecktor20top1"]
    out = {}
    for v in variants:
        if v == "hecktor_noremat":
            dt, loss0 = measure(build("hecktor20top1", remat=False))
            out[v] = {"ms_per_step": round(dt * 1e3, 1), "first_loss": loss0}
            print(v, out[v], flush=True)
        elif v == "da_unet_s2d":
            out[v] = run_s2d_ab()
        elif v == "hecktor_s2d":
            out[v] = run_hecktor_s2d_ab()
        else:
            out[v] = run_pool_ab(v)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""Same-process TPU A/B: reduce_window maxpool + gather nearest-resize
(round-3 code) vs reshape-max maxpool + strided-slice nearest-resize
(round-4 ops/resize.py). Protocol identical to bench.py (144^3, b1,
depth 24, bf16, remat off, s2d auto; 8 chained steps, one sync).

Run: python baselines/ab_r4_pool_resize.py
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

import hdenseformer_tpu.losses.losses as losses_mod
import hdenseformer_tpu.models.hdenseformer as hdf_mod
import hdenseformer_tpu.ops.resize as resize_mod
from hdenseformer_tpu.losses import get_loss
from hdenseformer_tpu.models import get_net
from hdenseformer_tpu.train.loop import make_train_step
from hdenseformer_tpu.train.state import TrainState, get_optimizer

VOL = (144, 144, 144)
STEPS = 8

NEW_MAX_POOL = resize_mod.max_pool
NEW_RESIZE = resize_mod.resize_nearest


def old_max_pool(x, window=2, stride=2):
    nsp = x.ndim - 2
    dims = (1,) + (window,) * nsp + (1,)
    strides = (1,) + (stride,) * nsp + (1,)
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, dims, strides, padding="VALID"
    )


def old_resize_nearest(x, size):
    for axis, out_len in enumerate(tuple(size)):
        in_len = x.shape[axis + 1]
        if in_len == out_len:
            continue
        idx = np.floor(np.arange(out_len) * (in_len / out_len)).astype(np.int32)
        idx = np.minimum(idx, in_len - 1)
        x = jnp.take(x, jnp.asarray(idx), axis=axis + 1)
    return x


def set_variant(new: bool):
    mp = NEW_MAX_POOL if new else old_max_pool
    rz = NEW_RESIZE if new else old_resize_nearest
    resize_mod.max_pool = mp
    resize_mod.resize_nearest = rz
    hdf_mod.max_pool = mp  # from-imported names at the call sites
    hdf_mod.resize_nearest = rz
    # losses.py imports resize_nearest inside the function body -> follows
    # resize_mod automatically


def measure():
    model = get_net(
        "HDenseFormer_32", channels=2, num_classes=2, input_shape=VOL,
        transformer_depth=24, dtype=jnp.bfloat16, remat=False,
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
    state, m = step(state, batch, rng)
    loss0 = float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, m = step(state, batch, rng)
    float(m["loss"])
    dt = (time.perf_counter() - t0) / STEPS
    return dt, loss0


def main():
    out = {}
    for name, new in [("old_pool_resize", False), ("new_pool_resize", True)]:
        set_variant(new)
        dt, loss0 = measure()
        out[name] = {"ms_per_step": round(dt * 1e3, 1), "first_loss": loss0}
        print(name, out[name], flush=True)
    a, b = out["old_pool_resize"], out["new_pool_resize"]
    out["speedup"] = round(a["ms_per_step"] / b["ms_per_step"], 4)
    assert abs(a["first_loss"] - b["first_loss"]) < 1e-3 * max(1, abs(a["first_loss"]))
    print(json.dumps(out))


if __name__ == "__main__":
    main()

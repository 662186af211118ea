"""Capture a jax.profiler device trace of the flagship train step.

Round-4 frontier analysis (VERDICT r3 item 3): traces the bench.py
configuration (HDenseFormer_32, 144^3, 2 modalities, batch 1, depth 24,
bf16, remat off, s2d auto) for a few steps after warmup, writing the
xplane to --out. Analyze with baselines/analyze_xplane.py.

Run: python baselines/trace_step.py --out /tmp/r4_trace [--steps 3]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/r4_trace")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--warm", type=int, default=2)
    ap.add_argument("--net", default="HDenseFormer_32")
    ap.add_argument("--vol", type=int, default=144)
    ap.add_argument("--depth", type=int, default=24)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--s2d", default="auto")
    args = ap.parse_args()

    from hdenseformer_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from hdenseformer_tpu.losses import get_loss
    from hdenseformer_tpu.models import get_net
    from hdenseformer_tpu.train.loop import make_train_step
    from hdenseformer_tpu.train.state import TrainState, get_optimizer

    vol = (args.vol,) * 3
    s2d = {"auto": None, "off": False, "on": True}[args.s2d]
    model = get_net(
        args.net, channels=2, num_classes=2, input_shape=vol,
        transformer_depth=args.depth, dtype=jnp.bfloat16, remat=False,
        s2d=s2d,
    )
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((args.batch,) + vol + (2,), jnp.float32)
    y = jnp.zeros((args.batch,) + vol + (2,), jnp.float32).at[..., 0].set(1.0)
    variables = model.init({"params": rng}, x)
    tx = get_optimizer("Adam", 1e-3, weight_decay=1e-4)
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"], tx=tx, model_state={}
    )
    criterion = get_loss("FocalLoss", use_ds=True)
    step = make_train_step(criterion, num_classes=2)
    batch = {"image": x, "label": y}

    for _ in range(args.warm):
        state, m = step(state, batch, rng)
    float(m["loss"])

    t0 = time.perf_counter()
    jax.profiler.start_trace(args.out)
    for _ in range(args.steps):
        state, m = step(state, batch, rng)
    float(m["loss"])
    jax.profiler.stop_trace()
    dt = time.perf_counter() - t0
    print(f"traced {args.steps} steps in {dt:.3f}s wall "
          f"({dt / args.steps * 1000:.1f} ms/step incl trace overhead) -> {args.out}")


if __name__ == "__main__":
    main()

"""Performance-knob registry: env read ONCE at import, settable via API.

The round-3 implementation read ``os.environ`` inside traced code
(ops/fused_norm.py, ops/shift_pack.py), which bakes whichever value the
first compile sees into the executable — silently ignored afterward,
including across the persistent compilation cache. Here every knob is
resolved exactly once at import time and is changeable only through the
explicit setters below (which callers must invoke BEFORE tracing; the
docstrings say so). Config plumbing: ``configs.Config.norm_barrier`` /
``Config.shift_pack`` apply these setters in ``SemanticSeg.__init__``
only when set to a string; their ``None`` default keeps the env-resolved
value, so ``HDF_*`` env vars remain effective on every entry point.

Knobs
-----
norm_barrier : "auto" | "on" | "off"   (env HDF_NORM_BARRIER: auto/1/0)
    Per-pass anti-CSE optimization barriers in the fused InstanceNorm+ReLU
    VJP (ops/fused_norm.py::_percopy). A TPU HBM-traffic optimization
    (round-3 A/B: -10% step time on v5e) that is pure overhead on CPU.
    "auto" (default) = on for the TPU backend, off elsewhere.

norm_t2 : "centered" | "uncentered"    (env HDF_NORM_T2)
    Experimental backward-reduce formulation in the same VJP; see
    ops/fused_norm.py::_bwd_rule.

shift_pack : "xla" | "pallas"          (env HDF_SHIFT_PACK)
    Implementation of the half-shift gather (ops/shift_pack.py).
    Benchmark-gated to "xla" by default: the Pallas kernel wins isolated
    (2.5x) but loses end-to-end because the custom call blocks XLA fusion
    with its neighbors (round-3 A/B, PARITY.md).

max_pool : "reshape" | "reduce_window"  (env HDF_MAX_POOL)
    window==stride max-pool lowering (ops/resize.py::max_pool).
    "reshape" (default) stays in the producer's T(8,128) layout;
    reduce_window + its select-and-scatter backward force T(2,128)
    relayouts (~10 ms/step on the 144^3 flagship, round-4 trace). Kept
    as a knob for same-process A/Bs.
"""
from __future__ import annotations

import os


def _env_norm_barrier() -> str:
    v = os.environ.get("HDF_NORM_BARRIER", "auto")
    return {"1": "on", "0": "off"}.get(v, "auto" if v not in ("on", "off") else v)


_norm_barrier: str = _env_norm_barrier()
_norm_t2: str = os.environ.get("HDF_NORM_T2", "centered")
_shift_pack: str = os.environ.get("HDF_SHIFT_PACK", "xla")


def set_norm_barrier(mode: str) -> None:
    """"auto" | "on" | "off". Call before the first trace/compile."""
    global _norm_barrier
    assert mode in ("auto", "on", "off"), mode
    _norm_barrier = mode


def norm_barrier_enabled() -> bool:
    if _norm_barrier == "auto":
        import jax

        return jax.default_backend() == "tpu"
    return _norm_barrier == "on"


def set_norm_t2(mode: str) -> None:
    """"centered" | "uncentered". Call before the first trace/compile."""
    global _norm_t2
    assert mode in ("centered", "uncentered"), mode
    _norm_t2 = mode


def norm_t2_mode() -> str:
    return _norm_t2


def set_shift_pack(mode: str) -> None:
    """"xla" | "pallas". Call before the first trace/compile."""
    global _shift_pack
    assert mode in ("xla", "pallas"), mode
    _shift_pack = mode


def shift_pack_mode() -> str:
    return _shift_pack


_max_pool: str = os.environ.get("HDF_MAX_POOL", "reshape")


def set_max_pool(mode: str) -> None:
    """"reshape" | "reduce_window". Call before the first trace/compile."""
    global _max_pool
    assert mode in ("reshape", "reduce_window"), mode
    _max_pool = mode


def max_pool_mode() -> str:
    return _max_pool

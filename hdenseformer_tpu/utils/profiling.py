"""Profiling / introspection (SURVEY.md §5.1).

Replaces the reference's thop MAC counting (utils.py:202-209) with XLA's
own cost analysis (exact for the compiled graph, free), adds wall-clock
timing and jax.profiler trace hooks, and a setproctitle-equivalent that
degrades gracefully.
"""
from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax
import numpy as np


def count_params(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


def count_flops(fn, *args, **kwargs) -> Optional[float]:
    """FLOPs of the jitted fn at these example args via XLA cost analysis."""
    try:
        lowered = jax.jit(fn).lower(*args, **kwargs)
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return float(cost.get("flops", float("nan")))
    except Exception:
        return None


class Timer:
    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self.start


@contextlib.contextmanager
def profiler_trace(log_dir: Optional[str]):
    """jax.profiler trace around a code region (no-op if log_dir is None)."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def set_process_title(title: str) -> None:
    """Best-effort process-title update (ref uses setproctitle, trainer.py:272)."""
    try:
        import setproctitle  # type: ignore

        setproctitle.setproctitle(title)
    except Exception:
        try:
            import ctypes

            libc = ctypes.CDLL("libc.so.6")
            libc.prctl(15, title.encode()[:15], 0, 0, 0)  # PR_SET_NAME
        except Exception:
            pass

"""Persistent XLA compilation cache.

The reference (PyTorch eager) starts instantly; a jit-compiled framework
pays multi-minute XLA compiles per (shape, config) per PROCESS unless the
executable cache persists to disk. This module turns JAX's persistent
compilation cache on for every entry point (cli.py, bench.py,
__graft_entry__.py) so only the first-ever process pays a given compile.

Measured on this machine (round 4, fresh processes, same 144^3 b1
depth24 train step): cold cache first call 595-605 s; warm persistent
cache 297 s. Through the remote-TPU relay the cache halves startup but
does NOT make it O(seconds): the residual ~300 s is relay-server-side
executable load/runtime setup, outside the client cache's reach
(PARITY.md round-3 note). On locally-attached TPUs (no relay) the
client compile is the dominant term and the cache removes it. On the
CPU backend the effect is direct: the driver's 8-device dryrun drops
194 s -> 85 s warm (__graft_entry__.py).

Opt out with HDF_TPU_NO_CACHE=1; override the location with
HDF_TPU_CACHE_DIR.
"""
from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "hdenseformer_tpu", "xla_cache"
)

_enabled = False


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Idempotently enable JAX's persistent compilation cache.

    Returns the cache directory in use, or None when disabled via env.
    Must run before the first compilation in the process (safe but
    ineffective for anything already compiled).
    """
    global _enabled
    if os.environ.get("HDF_TPU_NO_CACHE"):
        return None
    cache_dir = cache_dir or os.environ.get("HDF_TPU_CACHE_DIR", _DEFAULT_DIR)
    if _enabled:
        return cache_dir
    import jax

    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache every compile that takes >= 1s (the default 60s threshold would
    # skip most of this framework's graphs on CPU test runs)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    _enabled = True
    return cache_dir

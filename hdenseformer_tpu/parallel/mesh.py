"""Device mesh + sharding: the framework's distributed communication layer.

The reference has NO communication backend (single-process
``torch.nn.DataParallel``, trainer.py:228-229). Here this is a first-class
component (SURVEY.md §2.4): one ``jax.sharding.Mesh`` owns the devices;
the train step is compiled once with NamedShardings — batch split along
the ``data`` axis, parameters replicated — and XLA inserts the gradient
all-reduce over ICI (DCN across hosts via ``jax.distributed``).

An optional ``space`` mesh axis supports spatial partitioning of
whole-volume inference (the repo's "long-context" axis, SURVEY.md §5.7).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_distributed_init() -> None:
    """Initialize jax.distributed when launched multi-host (no-op otherwise).

    Launch contract: each process exports ``JAX_COORDINATOR_ADDRESS`` and,
    outside auto-detected clusters (SLURM/TPU pods), ``JAX_NUM_PROCESSES``
    + ``JAX_PROCESS_ID``. Exercised by the two-process CPU smoke test
    (tests/test_distributed.py) over the gloo CPU-collectives backend.
    """
    import os

    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not addr:
        return
    kwargs = {"coordinator_address": addr}
    if os.environ.get("JAX_NUM_PROCESSES"):
        kwargs["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
    if os.environ.get("JAX_PROCESS_ID"):
        kwargs["process_id"] = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(**kwargs)


def local_mesh_devices(n: Optional[int] = None) -> list:
    devs = jax.devices()
    if n is not None:
        if n > len(devs):
            raise ValueError(f"requested {n} devices, have {len(devs)}")
        devs = devs[:n]
    return devs


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("data",),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """Build a mesh over available devices.

    Default: 1-D ``('data',)`` mesh over all devices. Pass
    ``axis_names=('data','space'), shape=(d, s)`` for spatially-partitioned
    inference meshes.
    """
    devs = local_mesh_devices(n_devices)
    if shape is None:
        shape = (len(devs),) + (1,) * (len(axis_names) - 1)
    arr = np.asarray(devs).reshape(tuple(shape))
    return Mesh(arr, tuple(axis_names))


def batch_sharding(mesh: Mesh, ndim: int, axis: str = "data") -> NamedSharding:
    """Shard dim 0 (batch) along ``axis``; everything else replicated."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Device-put a host batch pytree with batch-axis sharding."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, batch_sharding(mesh, np.ndim(x))), tree
    )

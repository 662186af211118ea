"""Two-process jax.distributed smoke test on CPU (gloo collectives).

The reference has no multi-process training at all (DataParallel only,
trainer.py:228-229); this build's multi-host story is
``maybe_distributed_init`` + the same pjit train step over a global mesh
(SURVEY.md §2.4/§5.8). This test actually launches TWO processes, forms a
2-device global CPU mesh across them, and runs a psum-bearing computation
plus one data-parallel train step of the tiny 2D flagship — validating
the DCN/multi-host code path without TPU hardware.
"""
import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")

from hdenseformer_tpu.parallel.mesh import maybe_distributed_init, make_mesh

maybe_distributed_init()
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 2, jax.devices()
pid = jax.process_index()

# 1. cross-process collective: allgather of the process id
from jax.experimental import multihost_utils
got = multihost_utils.process_allgather(np.array([pid], np.int32))
assert sorted(got.ravel().tolist()) == [0, 1], got

# 2. one data-parallel train step over the global 2-device mesh
from jax.sharding import NamedSharding, PartitionSpec as P
from hdenseformer_tpu.losses import get_loss
from hdenseformer_tpu.train.loop import SemanticSeg, make_train_step

mesh = make_mesh()  # all (global) devices
seg = SemanticSeg(
    net_name="HDenseFormer_2D_16", lr=1e-3, n_epoch=1, channels=2,
    num_classes=2, roi_number=None, input_shape=(16, 16), crop=0,
    batch_size=2, num_workers=0, transform_2d=[1, 10],
    transformer_depth=8, use_fp16=False,
)
state = seg.build_state("Adam")
step = make_train_step(get_loss("FocalLoss", use_ds=True), num_classes=2)

rng = np.random.RandomState(0)
image = rng.rand(2, 16, 16, 2).astype(np.float32)
label = np.zeros((2, 16, 16, 2), np.float32)
label[..., 0] = 1.0
sharding = NamedSharding(mesh, P("data"))
batch = {
    k: jax.make_array_from_process_local_data(sharding, v[pid : pid + 1])
    for k, v in (("image", image), ("label", label))
}
state, metrics = step(state, batch, jax.random.PRNGKey(0))
# the loss is replicated over the global mesh: read this process's shard
loss = float(np.asarray(metrics["loss"].addressable_data(0)))
assert np.isfinite(loss), loss
print(f"proc {pid}: OK loss={loss}")
"""


def test_two_process_distributed_smoke(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            GLOO_SOCKET_IFNAME="lo",  # keep gloo on loopback in sandboxes
        )
        env.pop("JAX_PLATFORMS", None)
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", _WORKER],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            )
        )
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=560)
        outs.append(out.decode())
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]
    assert "proc 0: OK" in outs[0]
    assert "proc 1: OK" in outs[1]

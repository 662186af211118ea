"""Coverage for mesh helpers, profiling utils, logging, losses factory edges."""
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hdenseformer_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicated_sharding,
    shard_batch,
)
from hdenseformer_tpu.train.logging import MetricsWriter
from hdenseformer_tpu.utils import Timer, count_flops, count_params


def test_make_mesh_default_all_devices():
    mesh = make_mesh()
    assert mesh.axis_names == ("data",)
    assert int(np.prod(mesh.devices.shape)) == len(jax.devices())


def test_make_mesh_2d():
    n = len(jax.devices())
    mesh = make_mesh(axis_names=("data", "space"), shape=(n, 1))
    assert mesh.axis_names == ("data", "space")


def test_make_mesh_too_many_devices():
    with pytest.raises(ValueError):
        make_mesh(len(jax.devices()) + 1)


def test_shard_batch_places_on_mesh():
    mesh = make_mesh()
    n = len(jax.devices())
    batch = {"image": np.zeros((n * 2, 4, 4, 1), np.float32)}
    out = shard_batch(mesh, batch)
    assert out["image"].shape == (n * 2, 4, 4, 1)
    assert len(out["image"].sharding.device_set) == n


def test_count_params_and_flops():
    params = {"a": jnp.ones((3, 4)), "b": {"c": jnp.ones((5,))}}
    assert count_params(params) == 17
    flops = count_flops(lambda x: jnp.dot(x, jnp.ones((8, 8))), jnp.ones((8, 8)))
    assert flops is None or flops > 0


def test_timer():
    with Timer() as t:
        sum(range(1000))
    assert t.elapsed >= 0


def test_metrics_writer_jsonl(tmp_path):
    w = MetricsWriter(str(tmp_path))
    w.add_scalar("data/lr", 0.1, 0)
    w.add_scalars("data/loss", {"train": 1.0, "val": 2.0}, 1)
    w.close()
    lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    tags = {l["tag"] for l in lines}
    assert {"data/lr", "data/loss/train", "data/loss/val"} <= tags


def test_get_loss_unknown_raises():
    from hdenseformer_tpu.losses import get_loss

    with pytest.raises(ValueError):
        get_loss("NotALoss")


def test_get_net_unknown_raises():
    from hdenseformer_tpu.models import get_net

    with pytest.raises(ValueError):
        get_net("NotANet", 1, 2, (8, 8))


def test_fl_loss_and_binary_dice_reductions(rng):
    from hdenseformer_tpu.losses import binary_dice_loss

    p = jnp.asarray(np.abs(rng.rand(4, 10)).astype(np.float32))
    t = jnp.asarray((rng.rand(4, 10) > 0.5).astype(np.float32))
    none = binary_dice_loss(p, t, reduction="none")
    assert none.shape == (4,)
    with pytest.raises(ValueError):
        binary_dice_loss(p, t, reduction="bogus")

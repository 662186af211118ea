from hdenseformer_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    local_mesh_devices,
    maybe_distributed_init,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "local_mesh_devices",
    "maybe_distributed_init",
]

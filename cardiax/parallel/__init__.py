from cardiax.parallel.mesh import (
    get_mesh,
    batch_sharding,
    replicate_sharding,
    shard_batch,
    replicate,
    local_device_count,
)

__all__ = [
    "get_mesh",
    "batch_sharding",
    "replicate_sharding",
    "shard_batch",
    "replicate",
    "local_device_count",
]

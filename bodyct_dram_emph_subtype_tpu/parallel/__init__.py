from .mesh import (
    MeshSpec,
    batch_sharding,
    get_mesh,
    replicate,
    shard_batch,
)

__all__ = ["MeshSpec", "batch_sharding", "get_mesh", "replicate",
           "shard_batch"]

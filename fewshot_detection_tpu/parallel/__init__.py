from .mesh import (
    make_mesh, batch_sharding, replicated_sharding, shard_batch, replicate,
)

__all__ = [
    "make_mesh", "batch_sharding", "replicated_sharding", "shard_batch",
    "replicate",
]

from .mesh import (make_mesh, replicate, shard_batch, batch_sharding,
                   replicated_sharding)

__all__ = ["make_mesh", "replicate", "shard_batch", "batch_sharding",
           "replicated_sharding"]

from .mesh import (make_mesh, maybe_initialize_distributed, replicate,
                   shard_batch, batch_sharding, replicated_sharding)
from .tp import shard_params_tp, tp_shardings

__all__ = ["make_mesh", "maybe_initialize_distributed", "replicate",
           "shard_batch", "batch_sharding", "replicated_sharding",
           "shard_params_tp", "tp_shardings"]

from .mesh import (make_mesh, maybe_initialize_distributed, replicate,
                   shard_batch, batch_sharding, replicated_sharding)
from .tp import shard_params_tp, tp_shardings
from .sp import shard_time, sp_active
from .fsdp import fsdp_shardings, shard_params_fsdp

__all__ = ["make_mesh", "maybe_initialize_distributed", "replicate",
           "shard_batch", "batch_sharding", "replicated_sharding",
           "shard_params_tp", "tp_shardings", "shard_time", "sp_active",
           "fsdp_shardings", "shard_params_fsdp"]

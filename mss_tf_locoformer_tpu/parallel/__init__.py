from .mesh import (batch_sharding, local_mesh, make_mesh, replicated,
                   shard_batch)
from .sharding import tp_shardings, validate_tp

__all__ = ["make_mesh", "batch_sharding", "replicated", "shard_batch",
           "local_mesh", "tp_shardings", "validate_tp"]

from . import multihost
from .mesh import (batch_sharding, local_mesh, make_mesh, replicated,
                   shard_batch)
from .sharding import tp_shardings, validate_tp
from .tp_fused import tp_attention_step, tp_ffn_step

__all__ = ["make_mesh", "batch_sharding", "replicated", "shard_batch",
           "local_mesh", "tp_shardings", "validate_tp",
           "tp_attention_step", "tp_ffn_step", "multihost"]

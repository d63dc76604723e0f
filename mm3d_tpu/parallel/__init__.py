"""Mesh construction and SPMD sharding helpers (data parallel first)."""

from mm3d_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
)
from mm3d_tpu.parallel.sharded_fps import sharded_fps

__all__ = ["make_mesh", "batch_sharding", "replicated_sharding",
           "shard_batch", "sharded_fps"]

"""Mesh construction and SPMD sharding helpers (data parallel first)."""

from mm3d_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
)
from mm3d_tpu.parallel.sharded_fps import sharded_fps
from mm3d_tpu.parallel.point_shard import point_shard
from mm3d_tpu.parallel.sharded_group import (sharded_ball_query,
                                             sharded_sa_group_max,
                                             sharded_fp)

__all__ = ["make_mesh", "batch_sharding", "replicated_sharding",
           "shard_batch", "sharded_fps", "point_shard",
           "sharded_ball_query", "sharded_sa_group_max", "sharded_fp"]

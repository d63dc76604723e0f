"""Device mesh + sharding layout (SURVEY.md §2.5).

The reference has no distributed stack (single-process, single-GPU).
This rebuild is mesh-aware from day one: a ``(data, model)`` mesh where
batch-parallel training shards the batch axis over ``data`` and keeps
params replicated; XLA inserts the gradient all-reduce over ICI.  The
``model`` axis is reserved for tensor parallelism (unused by these small
models, but the layout and APIs already carry it so scaling up is a mesh
reshape, not a rewrite).

On this host there is 1 real TPU chip, so the mesh degenerates to 1x1;
tests exercise 8 virtual CPU devices (tests/conftest.py) and the driver
validates multi-chip compilation via __graft_entry__.dryrun_multichip.

Sequence/point-axis parallelism (SURVEY.md §2.5): the reference's
"sequence length" analog is the point count N, which this family handles
by FPS-downsampling to a fixed npoint and block-cropping scenes — there
is no attention over N, so ring-attention-style SP is not applicable.
For N >> 1e5 single-cloud workloads the N axis shards over the mesh:
`sharded_fps.py` implements SPMD FPS (local min-distance caches + two
tiny collectives per step) and `sharded_group.py` implements ball query
and the whole SA tail under point sharding (rank bookkeeping + the
max-distributes-over-shards identity; O(S·K) collectives) — both exact
vs the single-device ops on 4/8-device meshes.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(devices: Optional[Sequence] = None,
              data_parallel: Optional[int] = None,
              model_parallel: int = 1) -> Mesh:
    """Build a (data, model) mesh over the given (default: all) devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data_parallel is None:
        data_parallel = n // model_parallel
    if data_parallel * model_parallel != n:
        raise ValueError(
            f"mesh {data_parallel}x{model_parallel} != {n} devices")
    arr = np.array(devices).reshape(data_parallel, model_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device_put a (possibly nested) host batch with batch-axis sharding."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)

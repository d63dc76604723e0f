"""Point-sharding context: drive the SPMD point-axis ops through real
model forwards (VERDICT r2 item 2 — sharded_group was library-only).

Usage::

    from mm3d_tpu import parallel
    with parallel.point_shard(mesh, min_points=2048):
        log_probs, _ = model.apply(vars, points, train=False)

Inside the context, eval-mode SSG SetAbstraction blocks whose input
cloud has >= ``min_points`` points run their whole tail SPMD over the
mesh's point-sharded axis: `sharded_fps` for centroid selection and
`sharded_sa_group_max` for ball query + gather + folded-BN MLP + max
(parallel/sharded_group.py — max distributes over shards, collectives
are O(S·K), the O(N) work stays local).  Later blocks operate on the
S << N centroid set and stay replicated.  Semantics are exact
(tests/test_sharded_group.py, tests/test_point_shard_model.py).

This is trace-time state: enter the context before (or around) `jit`
tracing of the forward.  The decision is static per block — shapes and
mesh are compile-time constants, so nothing recompiles across steps.
"""

from __future__ import annotations

import contextlib
import dataclasses
import threading
from typing import Optional

from jax.sharding import Mesh


@dataclasses.dataclass(frozen=True)
class PointShardCtx:
    mesh: Mesh
    axis: str = "data"
    min_points: int = 2048


# per-thread stack: trace-time state must not leak across concurrently
# tracing threads (same pattern as ops.dispatch's mode)
_TLS = threading.local()


def _stack() -> list:
    if not hasattr(_TLS, "stack"):
        _TLS.stack = []
    return _TLS.stack


@contextlib.contextmanager
def point_shard(mesh: Mesh, axis: str = "data", min_points: int = 2048):
    """Enable point-axis sharding for SA blocks traced inside."""
    s = _stack()
    s.append(PointShardCtx(mesh, axis, min_points))
    try:
        yield s[-1]
    finally:
        s.pop()


def current() -> Optional[PointShardCtx]:
    s = _stack()
    return s[-1] if s else None

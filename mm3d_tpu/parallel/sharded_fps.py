"""Point-axis-sharded farthest point sampling (SURVEY.md §2.5 SP row).

For clouds too large for one chip's HBM/VMEM, the N axis is sharded over
the mesh's data axis and FPS runs as an SPMD loop: each device keeps its
point tile and a local running min-distance cache; per step it computes
its local (max-min-distance, owner-lane) candidate and a cross-device
argmax picks the global farthest point, whose coordinates are recovered
with a masked psum — two tiny collectives per step over ICI, the O(N)
work stays local.

Semantics match `farthest_point_sample` exactly (first-occurrence
tie-breaking across the global index order). Exercised on the virtual
8-device CPU mesh in tests; written for real multi-chip meshes.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def sharded_fps(xyz: jax.Array, npoint: int, mesh: Mesh,
                axis: str = "data") -> jax.Array:
    """FPS over a point-sharded cloud.

    Args:
      xyz: [B, N, 3]; N must divide by the mesh axis size.
      npoint: number of samples (static).
      mesh: device mesh; the N axis is sharded over `axis`.
    Returns:
      [B, npoint] int32 global indices, identical to the single-device op.
    """
    B, N, _ = xyz.shape
    n_shards = mesh.shape[axis]
    if N % n_shards:
        # public API: a bare assert vanishes under python -O and leaves
        # an opaque shard_map partition error instead
        raise ValueError(f"N={N} not divisible by mesh axis "
                         f"{axis!r}={n_shards}")
    tile = N // n_shards

    def local_fps(xyz_tile):
        # xyz_tile [B, tile, 3] — this shard's points
        shard = jax.lax.axis_index(axis)
        base = shard * tile  # global index offset of this tile

        def body(i, state):
            dist, far_idx, far_xyz, out = state
            out = jax.lax.dynamic_update_index_in_dim(out, far_idx, i,
                                                      axis=1)
            d = jnp.sum(jnp.square(xyz_tile - far_xyz[:, None, :]), -1)
            dist = jnp.minimum(dist, d)  # [B, tile]
            # local candidate: max distance, first-occurrence lane
            lmax = jnp.max(dist, axis=1)  # [B]
            lidx = jnp.argmax(dist, axis=1).astype(jnp.int32) + base
            # global winner: max over shards, ties -> smallest global
            # index (encode as max of (dist, -idx) lexicographic pair)
            gmax = jax.lax.pmax(lmax, axis)
            cand = jnp.where(lmax == gmax, lidx, jnp.int32(2**30))
            gidx = jax.lax.pmin(cand, axis)  # [B] global winner index
            # recover winner coordinates: owner contributes, others zero
            mine = (gidx >= base) & (gidx < base + tile)
            local_slot = jnp.clip(gidx - base, 0, tile - 1)
            coords = jnp.take_along_axis(
                xyz_tile, local_slot[:, None, None], axis=1)[:, 0]
            coords = jnp.where(mine[:, None], coords, 0.0)
            coords = jax.lax.psum(coords, axis)
            return dist, gidx, coords, out

        # derive from xyz_tile so the carry is marked shard-varying from
        # the start (shard_map's varying-axes check)
        dist0 = jnp.full_like(xyz_tile[..., 0], 1e10)
        far0 = jnp.zeros((B,), jnp.int32)  # global index 0
        # initial centroid coords: owner of index 0 broadcasts
        mine0 = jnp.equal(jax.lax.axis_index(axis), 0)
        c0 = jnp.where(mine0, xyz_tile[:, 0, :], 0.0)
        c0 = jax.lax.psum(c0, axis)
        out0 = jnp.zeros((B, npoint), jnp.int32)
        _, _, _, out = jax.lax.fori_loop(
            0, npoint, body, (dist0, far0, c0, out0))
        return out

    fn = jax.shard_map(
        local_fps, mesh=mesh,
        in_specs=P(None, axis, None),
        out_specs=P(),
    )
    return fn(xyz)

"""Point-axis-sharded ball query / grouping / SA-tail (SURVEY.md §2.5 SP
row; VERDICT r1 item 5 — the declared gap past `sharded_fps`).

For clouds whose N axis is sharded over the mesh, a whole SA block can
run SPMD without ever materializing a globally-gathered tensor:

* `sharded_ball_query` reproduces the exact single-device semantics
  (first-K hits in ascending *global* point order, pad-by-first-hit,
  zero-hit rows clamp to global index 0).  Each device ranks its local
  in-ball hits with a prefix count along its tile, offsets by the hit
  counts of lower shards (one tiny all_gather of [B,S] counts), and the
  K winner indices are recovered with a masked psum — O(N) work stays
  local, collectives are O(S·K).

* `sharded_sa_group_max` runs the whole eval-mode SA tail (ball query +
  gather + BN-folded shared MLP + neighbor max) on sharded points.  The
  key identity: `max` over neighbors distributes over shards, so each
  device MLPs only its *own* first-K local hits (masked to the global
  first-K) and a single `pmax` of [B,S,C_out] merges shards — no ring
  ppermute of point tiles is needed, and the collective payload is the
  *output* size, independent of N.  (A ring would move N·C of tile data
  per device; this moves S·C_out.  For the post-FPS S ≪ N regime the
  max-distributes formulation is strictly cheaper and is the
  TPU-idiomatic choice: one XLA collective over ICI, no hand-scheduled
  pipeline.)

Exercised on the virtual 8-device CPU mesh in tests
(tests/test_sharded_group.py) and by __graft_entry__.dryrun_multichip.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def _local_hits(radius, xyz_tile, new_xyz, axis):
    """Per-device in-ball mask + global-rank bookkeeping.

    Returns (in_ball [B,S,t], global_rank [B,S,t] 1-based among global
    hits, local_rank [B,S,t] 1-based among THIS tile's hits,
    local_cnt [B,S], cnt_all [B,S] global hit count, base: global
    index offset).
    """
    tile = xyz_tile.shape[1]
    shard = jax.lax.axis_index(axis)
    base = shard * tile
    # d² with the SAME cross-term formula (and op order) as
    # geometry.square_distance / the Pallas kernels: the elementwise
    # (a-b)² form rounds differently, and a point exactly at the radius
    # boundary would then be classified differently than on the
    # single-device path, breaking the exact-equality tests (ADVICE r2)
    cross = jnp.einsum("bsc,btc->bst", new_xyz, xyz_tile,
                       precision=jax.lax.Precision.HIGHEST)
    s2 = jnp.sum(new_xyz * new_xyz, axis=-1)[:, :, None]
    t2 = jnp.sum(xyz_tile * xyz_tile, axis=-1)[:, None, :]
    d2 = s2 - 2.0 * cross + t2
    in_ball = d2 <= radius * radius  # [B, S, t]
    local_rank = jnp.cumsum(in_ball.astype(jnp.int32), axis=-1)  # incl.
    cnt = local_rank[..., -1]  # [B, S] local hit count
    # hit counts of every shard: [n_shards, B, S] (tiny collective).
    # The total comes from psum (whose output the vma checker knows is
    # replicated); the all_gather feeds only the per-shard prefix, which
    # is genuinely device-varying and always flows into a later
    # psum/pmax before leaving the shard_map.
    cnt_all = jax.lax.all_gather(cnt, axis)
    sidx = jnp.arange(cnt_all.shape[0])
    prefix = jnp.sum(jnp.where((sidx < shard)[:, None, None],
                               cnt_all, 0), axis=0)  # exclusive, [B,S]
    global_rank = local_rank + prefix[:, :, None]
    return (in_ball, global_rank, local_rank, cnt,
            jax.lax.psum(cnt, axis), base)


def sharded_ball_query(radius: float, nsample: int, xyz: jax.Array,
                       new_xyz: jax.Array, mesh: Mesh,
                       axis: str = "data") -> jax.Array:
    """Ball query over a point-sharded cloud -> global indices [B,S,K].

    Exact single-device semantics (geometry._query_ball_jax): first K
    in-radius points by ascending global index; empty slots repeat the
    first hit; zero-hit rows are all zeros.
    """
    B, N, _ = xyz.shape
    n_shards = mesh.shape[axis]
    assert N % n_shards == 0, (N, n_shards)

    def local(xyz_tile, new_full):
        in_ball, grank, lrank, local_cnt, cnt_g, base = _local_hits(
            radius, xyz_tile, new_full, axis)
        tile = xyz_tile.shape[1]
        lane = jnp.arange(tile, dtype=jnp.int32)
        # scatter my first-K global hits into their output slot
        live = in_ball & (grank <= nsample)
        tgt = jnp.where(live, grank - 1, nsample)  # K = dump slot
        gidx = jnp.broadcast_to(base + lane, in_ball.shape)
        out = jnp.zeros((B, new_full.shape[1], nsample + 1), jnp.int32)
        out = out.at[
            jnp.arange(B)[:, None, None],
            jnp.arange(new_full.shape[1])[None, :, None],
            tgt,
        ].add(jnp.where(live, gidx, 0))
        out = jax.lax.psum(out[..., :nsample], axis)
        # pad-by-first-hit; zero-hit rows stay 0 (sentinel clamp)
        k_iota = jnp.arange(nsample)
        filled = jnp.where(k_iota[None, None, :] < jnp.maximum(
            cnt_g, 1)[:, :, None], out, out[..., 0:1])
        return filled

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(None, axis, None), P(None, None, None)),
        out_specs=P(),
    )
    return fn(xyz, new_xyz)


def sharded_sa_group_max(radius: float, nsample: int, xyz: jax.Array,
                         new_xyz: jax.Array, pre: jax.Array,
                         cbias: jax.Array, w1: jax.Array, b1: jax.Array,
                         w2: jax.Array, b2: jax.Array, mesh: Mesh,
                         axis: str = "data") -> jax.Array:
    """Eval-mode SA tail on a point-sharded cloud -> [B, S, C3].

    Same math as ops.pallas_kernels.fused_sa_pallas (BN pre-folded into
    `pre`/`cbias`/the dense weights): relu MLP over each of the first K
    global in-ball hits, max over hits.  `xyz` and `pre` are sharded on
    the point axis; `new_xyz`/`cbias` (post-FPS, S points) and the dense
    weights are replicated.  One all_gather of [B,S] counts + one pmax
    of the [B,S,C3] output; compute and HBM stay local.
    """
    B, N, _ = xyz.shape
    S = new_xyz.shape[1]
    n_shards = mesh.shape[axis]
    assert N % n_shards == 0, (N, n_shards)

    def mlp(h):
        h = jax.nn.relu(h)
        h = jax.nn.relu(h @ w1 + b1)
        return jax.nn.relu(h @ w2 + b2)

    def local(xyz_tile, pre_tile, new_full, cb_full):
        in_ball, grank, lrank, local_cnt, cnt_g, base = _local_hits(
            radius, xyz_tile, new_full, axis)
        tile = xyz_tile.shape[1]
        # my first-K *local* hits (superset of my share of the global
        # first K, since global_rank >= local_rank): gather their lane
        # ids per centroid, small fixed shape [B,S,K]
        live_l = in_ball & (lrank <= nsample)
        tgt = jnp.where(live_l, lrank - 1, nsample)
        lanes = jnp.zeros((B, S, nsample + 1), jnp.int32)
        lanes = lanes.at[
            jnp.arange(B)[:, None, None],
            jnp.arange(S)[None, :, None],
            tgt,
        ].add(jnp.where(live_l, jnp.arange(tile, dtype=jnp.int32), 0))
        lanes = lanes[..., :nsample]  # [B,S,K] local lane ids
        g = jnp.take_along_axis(  # [B,S,K,C1] local gather
            pre_tile[:, None, :, :], lanes[..., None], axis=2)
        # slot k is a real hit iff it is within MY hit count AND that
        # hit's global rank is within the global first K
        grank_sel = jnp.take_along_axis(grank, lanes, axis=2)  # [B,S,K]
        k_live = ((jnp.arange(nsample)[None, None, :]
                   < local_cnt[:, :, None])
                  & (grank_sel <= nsample))
        h = mlp(g + cb_full[:, :, None, :])
        h = jnp.where(k_live[..., None], h, -jnp.inf)
        out = jnp.max(h, axis=2)  # [B,S,C3] local partial max
        # zero-hit centroids use global point 0 (sentinel-clamp
        # semantics): device 0 contributes that row
        empty = cnt_g == 0
        h0 = mlp(pre_tile[:, 0:1, :] + cb_full)  # [B,S,C3]
        is0 = jax.lax.axis_index(axis) == 0
        out = jnp.where((empty[..., None]) & is0, h0,
                        jnp.where(empty[..., None], -jnp.inf, out))
        return jax.lax.pmax(out, axis)

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(None, axis, None), P(None, axis, None),
                  P(None, None, None), P(None, None, None)),
        out_specs=P(),
    )
    return fn(xyz, pre, new_xyz, cbias)


def sharded_knn_point(nsample: int, xyz: jax.Array, new_xyz: jax.Array,
                      mesh: Mesh, axis: str = "data") -> jax.Array:
    """kNN over a point-sharded cloud -> global indices [B,S,K], exact
    vs ops.knn_point (ascending distance, ties toward the lowest global
    index).

    Each shard computes its local top-K (tile >= K asserted), the
    K·n_shards candidates are all_gathered (payload S·K per shard —
    independent of N), re-sorted into GLOBAL INDEX order, and the final
    top-K re-selected: top_k picks the first occurrence among equal
    values, so index-ordering the candidates reproduces the
    single-device tie-break exactly.
    """
    B, N, _ = xyz.shape
    S = new_xyz.shape[1]
    n_shards = mesh.shape[axis]
    assert N % n_shards == 0, (N, n_shards)
    assert N // n_shards >= nsample, (
        f"tile {N // n_shards} < nsample {nsample}: kNN sharding needs "
        "every shard to hold at least K candidates")

    def local(xyz_tile, new_full):
        tile = xyz_tile.shape[1]
        shard = jax.lax.axis_index(axis)
        base = shard * tile
        cross = jnp.einsum("bsc,btc->bst", new_full, xyz_tile,
                           precision=jax.lax.Precision.HIGHEST)
        s2 = jnp.sum(new_full * new_full, axis=-1)[:, :, None]
        t2 = jnp.sum(xyz_tile * xyz_tile, axis=-1)[:, None, :]
        d2 = s2 - 2.0 * cross + t2  # [B,S,t]
        negd, lane = jax.lax.top_k(-d2, nsample)  # local top-K
        cand_d = -negd                              # [B,S,K]
        cand_i = lane.astype(jnp.int32) + base
        # [n_shards, B, S, K] -> [B, S, n_shards*K]
        all_d = jnp.moveaxis(jax.lax.all_gather(cand_d, axis), 0, 2
                             ).reshape(B, S, n_shards * nsample)
        all_i = jnp.moveaxis(jax.lax.all_gather(cand_i, axis), 0, 2
                             ).reshape(B, S, n_shards * nsample)
        # index-order the candidate pool so top_k's first-occurrence
        # tie-break matches the single-device scan order
        order = jnp.argsort(all_i, axis=-1)
        all_d = jnp.take_along_axis(all_d, order, axis=-1)
        all_i = jnp.take_along_axis(all_i, order, axis=-1)
        _, pick = jax.lax.top_k(-all_d, nsample)
        out = jnp.take_along_axis(all_i, pick, axis=-1)
        # every shard computed the identical result from the gathered
        # pool; the pmax is a semantic no-op that makes the replication
        # statically inferable for out_specs=P() (same pattern as the
        # ball-query/SA-tail functions, which end in psum/pmax)
        return jax.lax.pmax(out, axis)

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(None, axis, None), P(None, None, None)),
        out_specs=P(),
    )
    return fn(xyz, new_xyz)


def sharded_idx_group_max(idx: jax.Array, pre: jax.Array,
                          cbias: jax.Array, w1: jax.Array, b1: jax.Array,
                          w2: jax.Array, b2: jax.Array, mesh: Mesh,
                          axis: str = "data") -> jax.Array:
    """Eval-mode SA tail over PRECOMPUTED global indices on a
    point-sharded cloud -> [B, S, C3] (the SPMD twin of
    ops.pallas_kernels.fused_sa_idx_pallas, serving the kNN variant
    under --point_shard).

    Every idx slot belongs to exactly one shard, so each device gathers
    and MLPs only its own slots (masked -inf elsewhere) and one pmax of
    the [B,S,C3] output merges shards — the same max-distributes
    identity as sharded_sa_group_max, with none of the hit-count
    machinery (kNN always returns K valid slots).
    """
    B, N, _ = pre.shape
    S = idx.shape[1]
    n_shards = mesh.shape[axis]
    assert N % n_shards == 0, (N, n_shards)

    def mlp(h):
        h = jax.nn.relu(h)
        h = jax.nn.relu(h @ w1 + b1)
        return jax.nn.relu(h @ w2 + b2)

    def local(pre_tile, idx_full, cb_full):
        tile = pre_tile.shape[1]
        base = jax.lax.axis_index(axis) * tile
        mine = (idx_full >= base) & (idx_full < base + tile)  # [B,S,K]
        lanes = jnp.clip(idx_full - base, 0, tile - 1)
        g = jnp.take_along_axis(  # [B,S,K,C1] local gather
            pre_tile[:, None, :, :], lanes[..., None], axis=2)
        h = mlp(g + cb_full[:, :, None, :])
        h = jnp.where(mine[..., None], h, -jnp.inf)
        return jax.lax.pmax(jnp.max(h, axis=2), axis)

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(None, axis, None), P(None, None, None),
                  P(None, None, None)),
        out_specs=P(),
    )
    return fn(pre, idx, cbias)


def sharded_fp(xyz1: jax.Array, xyz2: jax.Array, pre: jax.Array,
               skip: jax.Array, mesh: Mesh,
               axis: str = "data") -> jax.Array:
    """Eval-mode FP tail on a point-sharded dense cloud -> [B, N, C1].

    Same math as ops.pallas_kernels.fused_fp_pallas (BN pre-folded):
    relu(three_interpolate(pre, 3nn(xyz1 -> xyz2)) + skip).  Each dense
    row's 3-NN/interpolation depends only on that row and the (small,
    replicated) sparse set, so the stage is embarrassingly parallel
    over the dense axis: `xyz1`/`skip` are sharded on the point axis,
    `xyz2`/`pre` replicated; compute and HBM stay local and the OUTPUT
    STAYS SHARDED on the point axis (XLA inserts a reshard lazily only
    where a replicated consumer needs it — no collective inside).
    Bitwise-identical to the single-device composition (same
    HIGHEST-precision distance formula, per-row top_k).
    """
    from mm3d_tpu.ops import geometry as G

    B, N, _ = xyz1.shape
    n_shards = mesh.shape[axis]
    assert N % n_shards == 0, (N, n_shards)

    def local(x1_t, sk_t, x2_full, pre_full):
        d, idx = G._three_nn_jax(x1_t, x2_full)
        w = G.interpolation_weights(d)
        interp = G._three_interpolate_jax(
            pre_full, idx, w.astype(pre_full.dtype))
        return jax.nn.relu(interp + sk_t)

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(None, axis, None), P(None, axis, None),
                  P(None, None, None), P(None, None, None)),
        # output stays sharded on the point axis; XLA reshards lazily
        # wherever a replicated consumer needs it
        out_specs=P(None, axis, None),
    )
    return fn(xyz1, skip, xyz2, pre)

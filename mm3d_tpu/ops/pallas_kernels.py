"""Pallas (Mosaic) TPU kernels for the hot geometry ops.

These register behind the pure-JAX reference implementations via
`dispatch` and must match them bit-exactly (tests enforce index-level
parity kernel == pure-JAX == torch oracle).

Design notes (see /opt/skills/guides/pallas_guide.md):

* FPS — the op is sequential in npoint (SURVEY.md §7 hard part (a)), so
  the entire loop runs inside ONE kernel with the xyz planes and the
  running min-distance cache resident in VMEM; HBM sees exactly one read
  of the points and one write of the indices.  The batch is vectorized
  across sublanes: each step does a few VPU passes over [Bt, N] planes
  (one-hot reduction for the centroid gather — lane-dynamic per-row
  gathers don't vectorize on TPU, multiply-reduce does).
* ball query — per (batch, centroid-tile) program: distances via one MXU
  matmul in VMEM, then the first-k-in-index-order selection as a k-step
  extract-min loop over masked lane iotas (no top_k in Mosaic).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mm3d_tpu.ops import dispatch


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


# ---------------------------------------------------------------- FPS


def _fps_kernel(npoint: int, n_actual: int, x_ref, y_ref, z_ref, start_ref,
                out_ref, mind_ref):
    Bt, N = x_ref.shape
    npad = out_ref.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (Bt, N), 1)
    valid = lane < n_actual
    mind_ref[:] = jnp.full((Bt, N), 1e10, jnp.float32)
    out_col = jax.lax.broadcasted_iota(jnp.int32, (Bt, npad), 1)
    out_ref[:] = jnp.zeros((Bt, npad), jnp.int32)

    x, y, z = x_ref[:], y_ref[:], z_ref[:]

    def body(i, far):
        # lane-dynamic stores must be 128-aligned on TPU; select-accumulate
        # instead (one cheap pass over [Bt, npoint] per step).
        out_ref[:] = jnp.where(out_col == i, far[:, None], out_ref[:])
        oh = (lane == far[:, None]).astype(jnp.float32)  # [Bt,N]
        cx = jnp.sum(x * oh, axis=1, keepdims=True)
        cy = jnp.sum(y * oh, axis=1, keepdims=True)
        cz = jnp.sum(z * oh, axis=1, keepdims=True)
        d = jnp.square(x - cx) + jnp.square(y - cy) + jnp.square(z - cz)
        m = jnp.minimum(mind_ref[:], d)
        m = jnp.where(valid, m, -1.0)
        mind_ref[:] = m
        # explicit first-occurrence argmax (Mosaic's argmax lowering
        # fails to legalize on single-tile [*,128] shapes)
        maxv = jnp.max(m, axis=1, keepdims=True)
        return jnp.min(jnp.where(m == maxv, lane, N), axis=1).astype(
            jnp.int32)

    jax.lax.fori_loop(0, npoint, body, start_ref[:, 0])


def _fps_kernel_v2(npoint: int, n_actual: int, nsplit: int, x_ref, y_ref,
                   z_ref, start_ref, out_ref, mind_ref):
    """FPS with the batch tile split into `nsplit` independent chains.

    The op is latency-bound, not throughput-bound: each of the npoint
    steps is a serial chain of ~6 dependent reduce/broadcast stages, and
    the measured 0.73 ms at B=64/N=1024 is ~15x the pure VPU throughput
    cost.  Processing independent batch sub-tiles inside one loop body
    gives the VLIW scheduler parallel chains to interleave, hiding
    reduction latency.  Also: invalid lanes are pre-poisoned to -1 once
    (min with d >= 0 keeps them -1) instead of a per-step mask pass.
    """
    Bt, N = x_ref.shape
    npad = out_ref.shape[1]
    sub = Bt // nsplit
    lane = jax.lax.broadcasted_iota(jnp.int32, (sub, N), 1)
    out_col = jax.lax.broadcasted_iota(jnp.int32, (Bt, npad), 1)
    out_ref[:] = jnp.zeros((Bt, npad), jnp.int32)
    mind_ref[:] = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (Bt, N), 1) < n_actual,
        1e10, -1.0)

    planes = [(x_ref[s * sub:(s + 1) * sub],
               y_ref[s * sub:(s + 1) * sub],
               z_ref[s * sub:(s + 1) * sub]) for s in range(nsplit)]

    def body(i, fars):
        # store the INCOMING selection at column i (step i's pick)
        far_all = jnp.concatenate(list(fars), 0)  # [Bt]
        out_ref[:] = jnp.where(out_col == i, far_all[:, None], out_ref[:])
        outs = []
        for s in range(nsplit):
            far = fars[s]
            x, y, z = planes[s]
            oh = (lane == far[:, None]).astype(jnp.float32)
            cx = jnp.sum(x * oh, axis=1, keepdims=True)
            cy = jnp.sum(y * oh, axis=1, keepdims=True)
            cz = jnp.sum(z * oh, axis=1, keepdims=True)
            d = (jnp.square(x - cx) + jnp.square(y - cy)
                 + jnp.square(z - cz))
            m = jnp.minimum(mind_ref[s * sub:(s + 1) * sub], d)
            mind_ref[s * sub:(s + 1) * sub] = m
            maxv = jnp.max(m, axis=1, keepdims=True)
            outs.append(jnp.min(jnp.where(m == maxv, lane, N),
                                axis=1).astype(jnp.int32))
        return tuple(outs)

    jax.lax.fori_loop(0, npoint, body,
                      tuple(start_ref[s * sub:(s + 1) * sub, 0]
                            for s in range(nsplit)))


def fps_pallas_v2(xyz: jax.Array, npoint: int, start_idx=0,
                  interpret: bool = None, nsplit: int = 4) -> jax.Array:
    """Latency-optimized FPS (interleaved independent batch chains)."""
    B, N, _ = xyz.shape
    Np = _round_up(N, 128)
    if isinstance(start_idx, int):
        start = jnp.full((B, 1), start_idx, jnp.int32)
    else:
        start = jnp.asarray(start_idx, jnp.int32).reshape(B, 1)
    planes = jnp.pad(xyz.astype(jnp.float32), ((0, 0), (0, Np - N), (0, 0)))
    x = planes[..., 0]
    y = planes[..., 1]
    z = planes[..., 2]
    budget = 6 * 1024 * 1024
    bt = max(1, min(B, budget // (5 * 4 * Np)))
    while B % bt:
        bt -= 1
    # each split must keep >= 8 sublanes
    ns = nsplit
    while ns > 1 and (bt % ns or bt // ns < 8):
        ns //= 2
    grid = (B // bt,)
    np_pad = _round_up(npoint, 128)
    spec = pl.BlockSpec((bt, Np), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    if interpret is None:
        interpret = not _on_tpu()
    out = pl.pallas_call(
        functools.partial(_fps_kernel_v2, npoint, N, ns),
        grid=grid,
        in_specs=[spec, spec, spec,
                  pl.BlockSpec((bt, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bt, np_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, np_pad), jnp.int32),
        scratch_shapes=[pltpu.VMEM((bt, Np), jnp.float32)],
        interpret=interpret,
    )(x, y, z, start)
    return out[:, :npoint]


def fps_pallas(xyz: jax.Array, npoint: int, start_idx=0,
               interpret: bool = None) -> jax.Array:
    """Pallas farthest point sampling; same contract as geometry._fps_jax."""
    B, N, _ = xyz.shape
    Np = _round_up(N, 128)
    if isinstance(start_idx, int):
        start = jnp.full((B, 1), start_idx, jnp.int32)
    else:
        start = jnp.asarray(start_idx, jnp.int32).reshape(B, 1)
    planes = jnp.pad(xyz.astype(jnp.float32), ((0, 0), (0, Np - N), (0, 0)))
    x = planes[..., 0]
    y = planes[..., 1]
    z = planes[..., 2]

    # batch tile: 5 [Bt, Np] f32 planes must fit comfortably in VMEM
    budget = 6 * 1024 * 1024
    bt = max(1, min(B, budget // (5 * 4 * Np)))
    while B % bt:
        bt -= 1
    grid = (B // bt,)
    # output lanes must be 128-aligned for Mosaic; kernel writes i<npoint
    np_pad = _round_up(npoint, 128)
    spec = pl.BlockSpec((bt, Np), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    if interpret is None:
        interpret = not _on_tpu()
    out = pl.pallas_call(
        functools.partial(_fps_kernel, npoint, N),
        grid=grid,
        in_specs=[spec, spec, spec,
                  pl.BlockSpec((bt, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bt, np_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, np_pad), jnp.int32),
        scratch_shapes=[pltpu.VMEM((bt, Np), jnp.float32)],
        interpret=interpret,
    )(x, y, z, start)
    return out[:, :npoint]


# ---------------------------------------------------------------- ball query


def _ball_query_kernel(radius2: float, nsample: int, n_actual: int,
                       new_ref, xyz_ref, out_ref):
    """First-K selection as a k-step extract-min over masked lane iotas.

    (A rank-prefix-sum variant with K independent masked-min extractions
    was raced on real v5e and lost — 5.7 ms vs 4.4 ms at S=512,K=32,
    N=1024: the log-shift prefix scan plus K full-width masked mins cost
    more VPU work than the serial chain saves in pipelining.  The fused
    SA kernel DOES use the rank trick, because there the one-hot it
    produces feeds the MXU gather directly and the extraction loop
    disappears entirely.)"""
    St = new_ref.shape[0]
    _, N = xyz_ref.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (St, N), 1)
    a = new_ref[:]          # [St, 3pad]
    b = xyz_ref[:]          # [3pad, N] (padded rows are zero)
    # d² = |a|² - 2 a·b + |b|²; one MXU matmul + rank-1 adds, fp32.
    cross = jnp.dot(a, b, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)  # [St, N]
    a2 = jnp.sum(a * a, axis=1, keepdims=True)
    b2 = jnp.sum(b * b, axis=0, keepdims=True)
    d2 = a2 - 2.0 * cross + b2
    in_ball = (d2 <= radius2) & (lane < n_actual)
    cand = jnp.where(in_ball, lane, N)  # ascending lane ids, N = miss

    kpad = out_ref.shape[1]
    out_col = jax.lax.broadcasted_iota(jnp.int32, (St, kpad), 1)
    out_ref[:] = jnp.full((St, kpad), N, jnp.int32)

    def body(j, cand):
        m = jnp.min(cand, axis=1, keepdims=True)  # first remaining hit
        out_ref[:] = jnp.where(out_col == j, m, out_ref[:])
        return jnp.where(cand == m, N, cand)

    cand = jax.lax.fori_loop(0, min(nsample, n_actual), body, cand)
    # lineage padding semantics: empty slots repeat the first hit;
    # zero-hit rows clamp the sentinel to 0 (matches geometry._query_ball_jax)
    first = out_ref[:, 0:1]
    filled = jnp.where(out_ref[:] == N, first, out_ref[:])
    out_ref[:] = jnp.where(filled == N, 0, filled)


def _ball_query_v2_kernel(radius2: float, nsample: int, n_actual: int,
                          use_tri: bool, new_ref, xyz_ref, *rest_refs):
    """Rank-scan ball query with MXU rank computation + index extraction.

    Instead of a K-step serial extract-min (K×~2 VPU passes over
    [st, N]), compute each lane's hit rank in ONE matmul — the 0/1
    in-ball mask is exact in bf16, so `in_ball @ lower_triangular_ones`
    is an exact inclusive prefix count on the MXU (tri_ref is passed in;
    for N beyond the VMEM budget the wrapper falls back to a log2(N)
    shift-add scan signalled by a [8,128] dummy).  Then build the
    [st*K, N] one-hot (rank == k+1) and extract the winning lane
    *indices* on the MXU too: lane ids split into two bf16-exact byte
    planes (hi = lane>>7, lo = lane&127 — both < 256) so
    `onehot @ [hi, lo]` recovers them exactly in one matmul.
    """
    if use_tri:
        tri_ref, out_ref = rest_refs
    else:
        (out_ref,) = rest_refs
    St = new_ref.shape[0]
    _, N = xyz_ref.shape
    K = nsample
    lane = jax.lax.broadcasted_iota(jnp.int32, (St, N), 1)
    a = new_ref[:]
    b = xyz_ref[:]
    cross = jnp.dot(a, b, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    a2 = jnp.sum(a * a, axis=1, keepdims=True)
    b2 = jnp.sum(b * b, axis=0, keepdims=True)
    d2 = a2 - 2.0 * cross + b2
    in_ball = (d2 <= radius2) & (lane < n_actual)
    if use_tri:
        rank = jnp.dot(in_ball.astype(jnp.bfloat16), tri_ref[:],
                       preferred_element_type=jnp.float32
                       ).astype(jnp.int32) * in_ball
    else:
        rank = _prefix_count(in_ball.astype(jnp.int32), lane) * in_ball
    cnt = jnp.sum(in_ball.astype(jnp.int32), axis=1, keepdims=True)

    R = St * K
    rank_rep = jnp.broadcast_to(rank[:, None, :], (St, K, N)).reshape(R, N)
    kv = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0) % K
    oh = (rank_rep == kv + 1).astype(jnp.bfloat16)

    lane_r = jax.lax.broadcasted_iota(jnp.int32, (N, 128), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (N, 128), 1)
    planes = jnp.where(col == 0, lane_r >> 7,
                       jnp.where(col == 1, lane_r & 127, 0)
                       ).astype(jnp.bfloat16)
    ext = jnp.dot(oh, planes,
                  preferred_element_type=jnp.float32)  # [R, 128]
    idx = (ext[:, 0].astype(jnp.int32) * 128
           + ext[:, 1].astype(jnp.int32)).reshape(St, K)

    # lineage padding: empty slots repeat the first hit; zero-hit rows 0
    first = idx[:, 0:1]
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (St, K), 1)
    idx = jnp.where(k_iota < jnp.maximum(cnt, 1), idx, first)
    kpad = out_ref.shape[1]
    if kpad > K:
        idx = jnp.pad(idx, ((0, 0), (0, kpad - K)))
    out_ref[:] = idx


def ball_query_v2_pallas(radius: float, nsample: int, xyz: jax.Array,
                         new_xyz: jax.Array,
                         interpret: bool = None) -> jax.Array:
    """Rank-scan ball query (same contract as ball_query_pallas)."""
    B, N, _ = xyz.shape
    S = new_xyz.shape[1]
    Np = _round_up(N, 128)
    Sp = _round_up(S, 8)
    Kp = _round_up(nsample, 128)

    xyz_t = jnp.pad(
        jnp.swapaxes(xyz.astype(jnp.float32), 1, 2),
        ((0, 0), (0, 5), (0, Np - N)))
    new_p = jnp.pad(new_xyz.astype(jnp.float32),
                    ((0, 0), (0, Sp - S), (0, 5)))

    # MXU rank path needs the [Np, Np] triangular-ones operand resident
    # in VMEM; raced on v5e it wins only at Np=1024-2048 (at Np<=512 the
    # [st, Np] scan is cheap and the tri matmul's low-row-count MXU
    # passes + smaller tiles cost more; past 2048 the operand exceeds
    # the VMEM budget) -> scan everywhere else
    # tri only at Np=1024: the [Np,Np] bf16 operand is 2 MB there but
    # 8 MB at 2048 (over the whole budget — this drove the centroid
    # tile to 1 sublane and Mosaic rejected the block shape)
    use_tri = Np == 1024
    extra_in = []
    extra_specs = []
    if use_tri:
        tri = (jax.lax.broadcasted_iota(jnp.int32, (Np, Np), 0)
               <= jax.lax.broadcasted_iota(jnp.int32, (Np, Np), 1)
               ).astype(jnp.bfloat16)
        extra_in = [tri]
        extra_specs = [pl.BlockSpec((Np, Np), lambda b, s: (0, 0),
                                    memory_space=pltpu.VMEM)]

    # the [st*K, Np] one-hot (bf16) is the big VMEM tenant
    if interpret is None:
        interpret = not _on_tpu()
    if interpret:
        st = Sp
    else:
        budget = 4 * 1024 * 1024 - (2 * Np * Np if use_tri else 0)
        stk_cap = max(8, budget // (2 * Np))
        # at least 8 sublanes (Mosaic block constraint; Sp is 8-aligned
        # so the decrement loop can never pass below 8)
        st = min(Sp, max(8, stk_cap // nsample))
        while Sp % st:
            st -= 1
    grid = (B, Sp // st)
    out = pl.pallas_call(
        functools.partial(_ball_query_v2_kernel, radius * radius,
                          nsample, N, use_tri),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, st, 8), lambda b, s: (b, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 8, Np), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + extra_specs,
        out_specs=pl.BlockSpec((None, st, Kp), lambda b, s: (b, s, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Sp, Kp), jnp.int32),
        interpret=interpret,
    )(new_p, xyz_t, *extra_in)
    return out[:, :S, :nsample]


def ball_query_pallas(radius: float, nsample: int, xyz: jax.Array,
                      new_xyz: jax.Array, interpret: bool = None) -> jax.Array:
    """Pallas ball query; same contract as geometry._query_ball_jax."""
    B, N, _ = xyz.shape
    S = new_xyz.shape[1]
    Np = _round_up(N, 128)
    Sp = _round_up(S, 8)
    Kp = _round_up(nsample, 128)

    xyz_t = jnp.pad(
        jnp.swapaxes(xyz.astype(jnp.float32), 1, 2),  # [B,3,N]
        ((0, 0), (0, 5), (0, Np - N)))                # pad 3->8 sublanes
    new_p = jnp.pad(new_xyz.astype(jnp.float32),
                    ((0, 0), (0, Sp - S), (0, 5)))    # [B,Sp,8]

    # centroid-tile size bounded by VMEM: the d² tile is [st, Np] f32 and
    # the candidate tile another [st, Np] i32 (~8 MB budget of the 16 MB
    # scoped limit).
    if interpret is None:
        interpret = not _on_tpu()
    st_cap = Sp if interpret else max(8, (4 * 1024 * 1024) // (4 * Np))
    st = Sp
    while st > st_cap and st % 2 == 0:
        st //= 2
    grid = (B, Sp // st)
    out = pl.pallas_call(
        functools.partial(_ball_query_kernel, radius * radius, nsample, N),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, st, 8), lambda b, s: (b, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 8, Np), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, st, Kp), lambda b, s: (b, s, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Sp, Kp), jnp.int32),
        interpret=interpret,
    )(new_p, xyz_t)
    return out[:, :S, :nsample]


# ---------------------------------------------------------------- three_nn


def _three_nn_kernel(m_actual: int, new_ref, xyz_ref, d_ref, i_ref):
    """Top-3 nearest: MXU distances + 3-step extract-min (argmin keeps
    first occurrence on ties, matching lax.top_k)."""
    Nt = new_ref.shape[0]
    _, M = xyz_ref.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (Nt, M), 1)
    a = new_ref[:]
    b = xyz_ref[:]
    cross = jnp.dot(a, b, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    a2 = jnp.sum(a * a, axis=1, keepdims=True)
    b2 = jnp.sum(b * b, axis=0, keepdims=True)
    d2 = a2 - 2.0 * cross + b2
    d2 = jnp.where(lane < m_actual, d2, jnp.inf)

    kpad = d_ref.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (Nt, kpad), 1)
    d_ref[:] = jnp.zeros((Nt, kpad), jnp.float32)
    i_ref[:] = jnp.zeros((Nt, kpad), jnp.int32)

    def body(j, d2):
        # explicit first-occurrence argmin (see FPS kernel note)
        minv = jnp.min(d2, axis=1, keepdims=True)
        am = jnp.min(jnp.where(d2 == minv, lane, M), axis=1).astype(
            jnp.int32)
        oh = lane == am[:, None]
        val = jnp.sum(jnp.where(oh, d2, 0.0), axis=1)
        d_ref[:] = jnp.where(col == j, val[:, None], d_ref[:])
        i_ref[:] = jnp.where(col == j, am[:, None], i_ref[:])
        return jnp.where(oh, jnp.inf, d2)

    jax.lax.fori_loop(0, 3, body, d2)


def three_nn_pallas(xyz1: jax.Array, xyz2: jax.Array,
                    interpret: bool = None):
    """Pallas 3-NN; same contract as geometry._three_nn_jax."""
    B, N, _ = xyz1.shape
    M = xyz2.shape[1]
    Mp = _round_up(M, 128)
    Np = _round_up(N, 8)
    dense = jnp.pad(xyz1.astype(jnp.float32), ((0, 0), (0, Np - N), (0, 5)))
    sparse_t = jnp.pad(
        jnp.swapaxes(xyz2.astype(jnp.float32), 1, 2),
        ((0, 0), (0, 5), (0, Mp - M)))
    # dense-tile size bounded by VMEM (d² tile is [nt, Mp] f32)
    nt_cap = max(8, (4 * 1024 * 1024) // (4 * Mp))
    nt = Np
    while nt > nt_cap and nt % 2 == 0:
        nt //= 2
    grid = (B, Np // nt)
    if interpret is None:
        interpret = not _on_tpu()
    d, i = pl.pallas_call(
        functools.partial(_three_nn_kernel, M),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, nt, 8), lambda b, s: (b, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 8, Mp), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((None, nt, 128), lambda b, s: (b, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, nt, 128), lambda b, s: (b, s, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, Np, 128), jnp.float32),
            jax.ShapeDtypeStruct((B, Np, 128), jnp.int32),
        ),
        interpret=interpret,
    )(dense, sparse_t)
    return d[:, :N, :3], i[:, :N, :3]


# ------------------------------------------------ fused SA block kernel


def _prefix_count(mask_i32: jax.Array, lane: jax.Array) -> jax.Array:
    """Inclusive prefix sum of a 0/1 int32 mask along lanes.

    log2(N) shift-adds (pltpu.roll + zero-fill mask) — this replaces the
    k-step extract-min selection of the standalone ball-query kernel:
    after the scan, the k-th accepted neighbor of each row is simply the
    lane where rank == k+1.
    """
    _, N = mask_i32.shape
    acc = mask_i32
    s = 1
    while s < N:
        sh = pltpu.roll(acc, s, axis=1)
        acc = acc + jnp.where(lane >= s, sh, 0)
        s *= 2
    return acc


def _fused_sa_kernel(radius2: float, nsample: int, n_actual: int,
                     use_tri: bool, new_ref, xyzt_ref, *rest_refs):
    """One SA block tail in one kernel: ball query + neighbor gather +
    (BN-folded) 2-layer shared MLP + max over neighbors.

    The [S,K,C] grouped tensor never exists in HBM: the k-th neighbor's
    one-hot row (rank == k+1) feeds the MXU gather directly, stacked as
    one [St*K, N] matmul operand (north star BASELINE.json:5 — "shared
    MLPs fused into the grouping gather"; SURVEY.md:82,88).
    """
    if use_tri:
        (tri_ref, pre_ref, cbias_ref, w1_ref, b1_ref, w2_ref, b2_ref,
         out_ref) = rest_refs
    else:
        (pre_ref, cbias_ref, w1_ref, b1_ref, w2_ref, b2_ref,
         out_ref) = rest_refs
    St = new_ref.shape[0]
    _, N = xyzt_ref.shape
    K = nsample
    lane = jax.lax.broadcasted_iota(jnp.int32, (St, N), 1)

    # squared distances, same formula/precision as the ball-query kernel
    a = new_ref[:]          # [St, 8] (xyz padded to 8 lanes)
    b = xyzt_ref[:]         # [8, N]
    cross = jnp.dot(a, b, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    a2 = jnp.sum(a * a, axis=1, keepdims=True)
    b2 = jnp.sum(b * b, axis=0, keepdims=True)
    d2 = a2 - 2.0 * cross + b2

    in_ball = (d2 <= radius2) & (lane < n_actual)
    if use_tri:
        # MXU inclusive prefix count: 0/1 mask is exact in bf16, so one
        # [St,N]@[N,N] triangular matmul replaces the log2(N) shift-add
        # VPU scan (the scan was the kernel's dominant cost)
        rank = jnp.dot(in_ball.astype(jnp.bfloat16), tri_ref[:],
                       preferred_element_type=jnp.float32
                       ).astype(jnp.int32) * in_ball
    else:
        rank = _prefix_count(in_ball.astype(jnp.int32), lane) * in_ball
    cnt = jnp.sum(in_ball.astype(jnp.int32), axis=1, keepdims=True)

    # stack the K one-hots per centroid: row r = s*K + k
    R = St * K
    Cb = cbias_ref.shape[-1]
    rank_rep = jnp.broadcast_to(rank[:, None, :], (St, K, N)).reshape(R, N)
    lane_rep = jax.lax.broadcasted_iota(jnp.int32, (R, N), 1)
    kv = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0) % K
    cnt_rep = jnp.broadcast_to(cnt[:, None, :], (St, K, 1)).reshape(R, 1)
    # slots past the hit count re-select the cnt-th (last) hit instead
    # of carrying a separate live-mask through the MLP: duplicates of a
    # live slot leave the max unchanged (the lineage pads with the
    # FIRST hit — also a duplicate), and the [R,C3] -inf masking pass
    # disappears.  k=0 stays clamped to >= 1 so zero-hit rows fall
    # through to the index-0 clamp below.
    oh = rank_rep == jnp.minimum(kv + 1, jnp.maximum(cnt_rep, 1))
    # zero-hit centroids: ALL K slots read index 0 (lineage semantics)
    oh = oh | ((cnt_rep == 0) & (lane_rep == 0))

    pre = pre_ref[:]        # [N, C1p], BN pre-folded
    dt = pre.dtype
    # f32 inputs must not decay to the default bf16 matmul passes (the
    # MLP must match the XLA path at fp32 tolerance — CLAUDE.md
    # invariant).  The big N-contraction gather dot exploits that the
    # 0/1 one-hot is EXACT in bf16: only `pre` needs widening, so a
    # 3-term bf16 split (~2^-24 rel) runs 3 MXU passes where HIGHEST
    # would re-widen both operands in 6.
    prec = (jax.lax.Precision.HIGHEST if dt == jnp.float32 else
            jax.lax.Precision.DEFAULT)
    ohb = oh.astype(jnp.bfloat16)
    if dt == jnp.float32:
        hi = pre.astype(jnp.bfloat16)
        r1 = pre - hi.astype(jnp.float32)
        mid = r1.astype(jnp.bfloat16)
        lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
        g = (jnp.dot(ohb, hi, preferred_element_type=jnp.float32)
             + jnp.dot(ohb, mid, preferred_element_type=jnp.float32)
             + jnp.dot(ohb, lo, preferred_element_type=jnp.float32))
    else:
        g = jnp.dot(ohb, pre, preferred_element_type=jnp.float32)
    cb = cbias_ref[:]
    cb_rep = jnp.broadcast_to(cb[:, None, :], (St, K, Cb)).reshape(R, Cb)
    h = jnp.maximum(g.astype(dt) + cb_rep, 0.0)
    h = jnp.dot(h, w1_ref[:], precision=prec,
                preferred_element_type=jnp.float32)
    h = jnp.maximum(h.astype(dt) + b1_ref[0:1, :], 0.0)
    h = jnp.dot(h, w2_ref[:], precision=prec,
                preferred_element_type=jnp.float32)
    h = jnp.maximum(h.astype(dt) + b2_ref[0:1, :], 0.0)
    # no live-mask needed: overflow slots are exact duplicates (above)
    out_ref[:] = jnp.max(h.reshape(St, K, h.shape[-1]), axis=1)


def _fused_sa_kernel_v4(radius2: float, nsample: int, n_actual: int,
                        use_tri: bool, P: int, C1: int, new_ref, xyzt_ref,
                        *rest_refs):
    """v4 fused SA tail: block-packed gather.

    The kernel is MXU-bound (measured: v3's cheaper one-hot build was a
    wash), and the dominant cost is the one-hot gather matmul
    [R,N]@[N,128] whose output lanes are only C1 < 128 wide.  v4 packs
    P = 128//C1 point-blocks side by side in the RHS:

        RHS2[m, q*C1:(q+1)*C1] = pre[q*(N/P) + m]   (m < N/P)

    so the contraction shrinks to N/P — the gather matmul drops 2x at
    SA1 (C1=64) and 4x at the semseg head (C1=32).  Selection: ranks
    are global, so the (k+1)-th hit lies in block q* iff
    cum_cnt[q*] < k+1 <= cum_cnt[q*+1]; the one-hot over packed lanes is
    the SUM of per-block arithmetic one-hots (a global rank value occurs
    in at most one block), and the correct C1-lane slice of the packed
    matmul output is picked per row from q* — P cheap selects over
    [R, C1] instead of any full-width work.  The rank prefix matmul runs
    int8 x int8 -> int32 (exact for 0/1 masks, 2x bf16 MXU throughput).
    """
    if use_tri:
        (tri_ref, pre_ref, cbias_ref, w1_ref, b1_ref, w2_ref, b2_ref,
         out_ref) = rest_refs
    else:
        (pre_ref, cbias_ref, w1_ref, b1_ref, w2_ref, b2_ref,
         out_ref) = rest_refs
    St = new_ref.shape[0]
    _, N = xyzt_ref.shape
    K = nsample
    NP = N // P
    lane = jax.lax.broadcasted_iota(jnp.int32, (St, N), 1)

    a = new_ref[:]
    b = xyzt_ref[:]
    cross = jnp.dot(a, b, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    a2 = jnp.sum(a * a, axis=1, keepdims=True)
    b2 = jnp.sum(b * b, axis=0, keepdims=True)
    d2 = a2 - 2.0 * cross + b2

    in_ball = (d2 <= radius2) & (lane < n_actual)
    if use_tri:
        rank_f = jnp.dot(in_ball.astype(jnp.int8), tri_ref[:],
                         preferred_element_type=jnp.int32).astype(
                             jnp.float32)
    else:
        rank_f = _prefix_count(in_ball.astype(jnp.int32), lane).astype(
            jnp.float32)
    rank_m = jnp.where(in_ball, rank_f, 0.0).astype(jnp.bfloat16)
    cnt = jnp.sum(in_ball.astype(jnp.int32), axis=1, keepdims=True)

    R = St * K
    row = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
    if St & (St - 1) == 0:
        kv = row >> (St.bit_length() - 1)
    else:
        kv = row // St
    cnt_rep = pltpu.repeat(cnt, K, axis=0)              # [R, 1] i32
    # overflow slots re-select the cnt-th hit (duplicates leave the max
    # unchanged — see _fused_sa_kernel); min computed in int32, result
    # <= K <= 128 so the bf16 cast is exact
    kv1i = jnp.minimum(kv + 1, jnp.maximum(cnt_rep, 1))
    kv1 = kv1i.astype(jnp.bfloat16)
    # packed one-hot: sum of per-block arithmetic one-hots (global
    # ranks — at most one block matches any k+1)
    oh = None
    for q in range(P):
        rq = pltpu.repeat(rank_m[:, q * NP:(q + 1) * NP], K, axis=0)
        ohq = jnp.maximum(1.0 - jnp.abs(rq - kv1), 0.0)
        oh = ohq if oh is None else oh + ohq

    pre = pre_ref[:]        # [NP, P*C1 padded to lanes], BN pre-folded
    dt = pre.dtype
    prec = (jax.lax.Precision.HIGHEST if dt == jnp.float32 else
            jax.lax.Precision.DEFAULT)
    if dt == jnp.float32:
        hi = pre.astype(jnp.bfloat16)
        r1 = pre - hi.astype(jnp.float32)
        mid = r1.astype(jnp.bfloat16)
        lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
        g2 = (jnp.dot(oh, hi, preferred_element_type=jnp.float32)
              + jnp.dot(oh, mid, preferred_element_type=jnp.float32)
              + jnp.dot(oh, lo, preferred_element_type=jnp.float32))
    else:
        g2 = jnp.dot(oh, pre, preferred_element_type=jnp.float32)

    if P > 1:
        # block of the selected (clamped) slot rank: q* = #{q :
        # cum_cnt_q < kv1i} - 1, where cum_cnt_q counts hits in blocks
        # < q (tiny [R,1] algebra).  kv1i is the CLAMPED rank from
        # above — overflow slots must locate the cnt-th hit's block,
        # not the nonexistent (k+1)-th.
        cum = jnp.zeros_like(cnt)
        bstar = jnp.zeros_like(kv)
        for q in range(1, P):
            cum = cum + jnp.sum(
                in_ball[:, (q - 1) * NP:q * NP].astype(jnp.int32),
                axis=1, keepdims=True)
            bstar = bstar + (kv1i > pltpu.repeat(cum, K, axis=0)
                             ).astype(jnp.int32)
        g = jnp.zeros((R, C1), jnp.float32)
        for q in range(P):
            g = jnp.where(bstar == q, g2[:, q * C1:(q + 1) * C1], g)
    else:
        g = g2[:, :C1]
    # zero-hit centroids: ALL K slots read global index 0 = packed row
    # 0, block 0 (lineage semantics; no live-mask downstream)
    g = jnp.where(cnt_rep == 0,
                  pre_ref[0:1, :C1].astype(jnp.float32), g)
    cb_rep = pltpu.repeat(cbias_ref[:], K, axis=0)      # [R, C1pad]
    h = jnp.maximum(g.astype(dt) + cb_rep[:, :C1], 0.0)
    h = jnp.dot(h, w1_ref[:C1, :], precision=prec,
                preferred_element_type=jnp.float32)
    h = jnp.maximum(h.astype(dt) + b1_ref[0:1, :], 0.0)
    h = jnp.dot(h, w2_ref[:], precision=prec,
                preferred_element_type=jnp.float32)
    h = jnp.maximum(h.astype(dt) + b2_ref[0:1, :], 0.0)

    # no live-mask: overflow slots are exact duplicates of the cnt-th
    # hit (or of the index-0 clamp), so the K-slice max is unaffected
    acc = h[0:St]
    for k in range(1, K):
        acc = jnp.maximum(acc, h[k * St:(k + 1) * St])
    out_ref[:] = acc


def _fused_sa_kernel_v6(radius2: float, nsample: int, n_actual: int,
                        use_tri: bool, new_ref, xyzt_ref, *rest_refs):
    """v6 fused SA tail: v2's s-major layout with a MINIMAL one-hot.

    The VPU floor scales with ALU ops per [St*K, N] element, not with
    how the stack is laid out (a K-loop variant that never built the
    stack — same total ops — measured a
    wash).  v6 strips the build to the minimum: one broadcast
    materialization + one integer compare + one cast.  The zero-hit
    clamp moves post-gather (one [R, C1] select against the pre[0] row
    — v3's trick), which deletes BOTH the [R, N] lane-iota and the
    or-pass of v2.  Overflow slots re-select the cnt-th hit via the
    [R,1] clamp (no live-mask, as v2/v4).
    """
    if use_tri:
        (tri_ref, pre_ref, cbias_ref, w1_ref, b1_ref, w2_ref, b2_ref,
         out_ref) = rest_refs
    else:
        (pre_ref, cbias_ref, w1_ref, b1_ref, w2_ref, b2_ref,
         out_ref) = rest_refs
    St = new_ref.shape[0]
    _, N = xyzt_ref.shape
    K = nsample
    lane = jax.lax.broadcasted_iota(jnp.int32, (St, N), 1)

    a = new_ref[:]
    b = xyzt_ref[:]
    cross = jnp.dot(a, b, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    a2 = jnp.sum(a * a, axis=1, keepdims=True)
    b2 = jnp.sum(b * b, axis=0, keepdims=True)
    d2 = a2 - 2.0 * cross + b2

    in_ball = (d2 <= radius2) & (lane < n_actual)
    if use_tri:
        rank = jnp.dot(in_ball.astype(jnp.int8), tri_ref[:],
                       preferred_element_type=jnp.int32) * in_ball
    else:
        rank = _prefix_count(in_ball.astype(jnp.int32), lane) * in_ball
    cnt = jnp.sum(in_ball.astype(jnp.int32), axis=1, keepdims=True)

    R = St * K
    Cb = cbias_ref.shape[-1]
    rank_rep = jnp.broadcast_to(rank[:, None, :], (St, K, N)).reshape(R, N)
    kv = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0) % K
    cnt_rep = jnp.broadcast_to(cnt[:, None, :], (St, K, 1)).reshape(R, 1)
    kv1i = jnp.minimum(kv + 1, jnp.maximum(cnt_rep, 1))
    ohb = (rank_rep == kv1i).astype(jnp.bfloat16)

    pre = pre_ref[:]        # [N, C1p], BN pre-folded
    dt = pre.dtype
    prec = (jax.lax.Precision.HIGHEST if dt == jnp.float32 else
            jax.lax.Precision.DEFAULT)
    if dt == jnp.float32:
        hi = pre.astype(jnp.bfloat16)
        r1 = pre - hi.astype(jnp.float32)
        mid = r1.astype(jnp.bfloat16)
        lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
        g = (jnp.dot(ohb, hi, preferred_element_type=jnp.float32)
             + jnp.dot(ohb, mid, preferred_element_type=jnp.float32)
             + jnp.dot(ohb, lo, preferred_element_type=jnp.float32))
    else:
        g = jnp.dot(ohb, pre, preferred_element_type=jnp.float32)
    # zero-hit centroids read index 0 (post-gather, [R, C1p] select)
    g = jnp.where(cnt_rep == 0, pre_ref[0:1, :].astype(jnp.float32), g)
    cb = cbias_ref[:]
    cb_rep = jnp.broadcast_to(cb[:, None, :], (St, K, Cb)).reshape(R, Cb)
    h = jnp.maximum(g.astype(dt) + cb_rep, 0.0)
    h = jnp.dot(h, w1_ref[:], precision=prec,
                preferred_element_type=jnp.float32)
    h = jnp.maximum(h.astype(dt) + b1_ref[0:1, :], 0.0)
    h = jnp.dot(h, w2_ref[:], precision=prec,
                preferred_element_type=jnp.float32)
    h = jnp.maximum(h.astype(dt) + b2_ref[0:1, :], 0.0)
    out_ref[:] = jnp.max(h.reshape(St, K, h.shape[-1]), axis=1)


def _fused_sa_kernel_v7(radius2: float, nsample: int, n_actual: int,
                        use_tri: bool, C1: int, new_ref, xyzt_ref,
                        *rest_refs):
    """v7 fused SA tail: slab-select gather (the indexed-gather attack
    on the one-hot build floor, VERDICT r3 item 2/Missing 5).

    v2/v4/v6 all pay ~3 VPU passes over the [R=St*K, N] one-hot stack
    (broadcast + compare + cast) — the measured serving floor.  v7
    never materializes a full-width one-hot.  Ranks are global and
    monotone along lanes, so the (k+1)-th hit's 128-lane GROUP is
    computable from per-group prefix counts with [R,1] algebra; the
    build then becomes:

      1. gstar [R,1]: which group holds the clamped target rank
         (Gn cheap compares on [R,1]).
      2. sel [R,128]: the target group's global-rank slab, via a
         Gn-way select chain — ONE pass over [R, N] total (the slabs
         are read in place; no K-replication materializes).
      3. oh [R,128] = (sel == kv1i) — compare + cast on 128 lanes
         instead of N.

    The gather matmul runs against a group-packed RHS
    (pre_packed[m, g*C1+c] = pre[g*128+m, c]): [R,128]@[128,Gn*C1]
    = R*N*C1 MACs — the same reduction v4's block packing achieves —
    and the true block is picked per row from gstar afterwards
    ([R, C1] selects).  Build cost ~1 pass + eps vs ~3.
    """
    if use_tri:
        (tri_ref, pre_ref, cbias_ref, w1_ref, b1_ref, w2_ref, b2_ref,
         out_ref) = rest_refs
    else:
        (pre_ref, cbias_ref, w1_ref, b1_ref, w2_ref, b2_ref,
         out_ref) = rest_refs
    St = new_ref.shape[0]
    _, N = xyzt_ref.shape
    K = nsample
    L = 128
    Gn = N // L
    lane = jax.lax.broadcasted_iota(jnp.int32, (St, N), 1)

    a = new_ref[:]
    b = xyzt_ref[:]
    cross = jnp.dot(a, b, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    a2 = jnp.sum(a * a, axis=1, keepdims=True)
    b2 = jnp.sum(b * b, axis=0, keepdims=True)
    d2 = a2 - 2.0 * cross + b2

    in_ball = (d2 <= radius2) & (lane < n_actual)
    if use_tri:
        rank = jnp.dot(in_ball.astype(jnp.int8), tri_ref[:],
                       preferred_element_type=jnp.int32) * in_ball
    else:
        rank = _prefix_count(in_ball.astype(jnp.int32), lane) * in_ball
    cnt = jnp.sum(in_ball.astype(jnp.int32), axis=1, keepdims=True)

    # per-group hit counts -> exclusive prefix (gcum[g] = hits before
    # group g); all [St, 1]
    gcum = [jnp.zeros_like(cnt)]
    for g in range(1, Gn):
        gcum.append(gcum[-1] + jnp.sum(
            in_ball[:, (g - 1) * L:g * L].astype(jnp.int32),
            axis=1, keepdims=True))

    R = St * K
    row = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
    if St & (St - 1) == 0:
        kv = row >> (St.bit_length() - 1)
    else:
        kv = row // St
    cnt_rep = pltpu.repeat(cnt, K, axis=0)              # [R, 1] k-major
    kv1i = jnp.minimum(kv + 1, jnp.maximum(cnt_rep, 1))
    # target group: #{g >= 1 : gcum[g] < kv1i}
    gstar = jnp.zeros_like(kv1i)
    for g in range(1, Gn):
        gstar = gstar + (pltpu.repeat(gcum[g], K, axis=0)
                         < kv1i).astype(jnp.int32)

    # slab-select the target group's global-rank tile, k-major rows
    parts = []
    for k in range(K):
        gk = gstar[k * St:(k + 1) * St]                 # [St, 1]
        acc = rank[:, 0:L]
        for g in range(1, Gn):
            acc = jnp.where(gk == g, rank[:, g * L:(g + 1) * L], acc)
        parts.append(acc)
    sel = jnp.concatenate(parts, axis=0) if K > 1 else parts[0]
    # global ranks are distinct within a row; masked non-hits hold 0
    # and kv1i >= 1, so the compare is exact with no in-ball re-mask
    oh = (sel == kv1i).astype(jnp.bfloat16)             # [R, 128]

    pre = pre_ref[:]        # [128, Gn*C1 (padded)], group-packed
    dt = pre.dtype
    prec = (jax.lax.Precision.HIGHEST if dt == jnp.float32 else
            jax.lax.Precision.DEFAULT)
    if dt == jnp.float32:
        hi = pre.astype(jnp.bfloat16)
        r1 = pre - hi.astype(jnp.float32)
        mid = r1.astype(jnp.bfloat16)
        lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
        g2 = (jnp.dot(oh, hi, preferred_element_type=jnp.float32)
              + jnp.dot(oh, mid, preferred_element_type=jnp.float32)
              + jnp.dot(oh, lo, preferred_element_type=jnp.float32))
    else:
        g2 = jnp.dot(oh, pre, preferred_element_type=jnp.float32)

    # pick the target block's C1 lanes per row
    g = g2[:, 0:C1]
    for q in range(1, Gn):
        g = jnp.where(gstar == q, g2[:, q * C1:(q + 1) * C1], g)
    # zero-hit centroids read global index 0 = packed row 0, block 0
    g = jnp.where(cnt_rep == 0,
                  pre_ref[0:1, 0:C1].astype(jnp.float32), g)
    cb_rep = pltpu.repeat(cbias_ref[:], K, axis=0)      # [R, C1pad]
    h = jnp.maximum(g.astype(dt) + cb_rep[:, :C1], 0.0)
    h = jnp.dot(h, w1_ref[:C1, :], precision=prec,
                preferred_element_type=jnp.float32)
    h = jnp.maximum(h.astype(dt) + b1_ref[0:1, :], 0.0)
    h = jnp.dot(h, w2_ref[:], precision=prec,
                preferred_element_type=jnp.float32)
    h = jnp.maximum(h.astype(dt) + b2_ref[0:1, :], 0.0)

    # k-strided max (overflow slots are duplicates — see v2)
    acc = h[0:St]
    for k in range(1, K):
        acc = jnp.maximum(acc, h[k * St:(k + 1) * St])
    out_ref[:] = acc


def fused_sa_pallas(radius: float, nsample: int, xyz: jax.Array,
                    new_xyz: jax.Array, pre: jax.Array, cbias: jax.Array,
                    w1: jax.Array, b1: jax.Array, w2: jax.Array,
                    b2: jax.Array, interpret: bool = None,
                    version: int = None) -> jax.Array:
    """Fused SA tail: returns max_k MLP(gather(pre)[.,k] + cbias) [B,S,C3].

    Args:
      radius, nsample: ball-query params (exact lineage semantics).
      xyz [B,N,3] f32, new_xyz [B,S,3] f32: points / FPS centroids.
      pre [B,N,C1]: first-MLP-layer projection of the inputs with the
        eval-mode BN scale folded in (see models.pointnet2.SetAbstraction).
      cbias [B,S,C1]: per-centroid additive term (recentering + folded
        BN shift + bias).
      w1 [C1,C2], b1 [C2], w2 [C2,C3], b2 [C3]: BN-folded rest layers.
      version: kernel variant; None = measured-best per shape.  All
        versions are bit-identical on chip (scripts/proto_sa_v3.py):
        v4 (block-packed gather + k-major repeat one-hot) wins +12-13%
        wherever the MXU triangular rank matmul is off (N != 1024); at
        tri shapes v6 (minimal 3-pass one-hot build, zero-hit clamp
        post-gather) edges v2 by 1-2%.  r3 negative results (variants
        raced on chip, then deleted): a K-loop that never materializes
        the [St*K, N] stack tied v2 (3.54 ms SA1 — the VPU cost is the
        per-element ALU work, not the layout), and an int8-rank compare
        fails to compile in Mosaic (no packed narrow vector compare).
        The one-hot build floor is ~3 full passes over [St*K, N] in
        32-bit VPU lanes — v2/v4/v6 all sit on it.  v7 (slab-select
        gather, r4) attacks that floor directly: ~1 pass + eps build,
        same gather MACs as v4 — opt-in until raced on chip.
    """
    B, N, _ = xyz.shape
    S = new_xyz.shape[1]
    C1, C2, C3 = pre.shape[-1], w1.shape[-1], w2.shape[-1]
    dt = pre.dtype
    dsz = jnp.dtype(dt).itemsize
    Np = _round_up(N, 128)
    if version is None:
        version = 6 if Np == 1024 else 4
    if version not in (2, 4, 6, 7):
        # v3 (and other raced-then-deleted variants) are gone; fail
        # loudly instead of NameError-ing at trace time.
        raise ValueError(f"unknown fused-SA kernel version {version!r}"
                         " (available: 2, 4, 6, 7)")
    if version == 4 and nsample > 128:
        # v4's bf16 arithmetic one-hot is exact only for slot ranks
        # <= 128 (bf16 integers are exact to 256 and the compared
        # clamped rank must stay below that); v2/v6 compare in int32
        version = 6 if Np == 1024 else 2
    Sp = _round_up(S, 8)
    C1p, C2p, C3p = (_round_up(c, 128) for c in (C1, C2, C3))

    # v4 block-packing factor: P point-blocks share the 128 RHS lanes
    P = 1
    if version == 4:
        for p in (8, 4, 2):
            if (C1 * p <= 128 and N == Np and N % p == 0
                    and (N // p) % 128 == 0):
                P = p
                break

    xyz_t = jnp.pad(
        jnp.swapaxes(xyz.astype(jnp.float32), 1, 2),
        ((0, 0), (0, 5), (0, Np - N)))
    new_p = jnp.pad(new_xyz.astype(jnp.float32),
                    ((0, 0), (0, Sp - S), (0, 5)))
    Gn = Np // 128
    if version == 7:
        # group-packed RHS: row m lanes [g*C1:(g+1)*C1] = pre[g*128 + m]
        lanes7 = _round_up(Gn * C1, 128)
        pre_p = jnp.pad(
            jnp.swapaxes(
                jnp.pad(pre, ((0, 0), (0, Np - N), (0, 0))
                        ).reshape(B, Gn, 128, C1), 1, 2
            ).reshape(B, 128, Gn * C1),
            ((0, 0), (0, 0), (0, lanes7 - Gn * C1)))
        pre_rows, pre_lanes = 128, lanes7
    elif P > 1:
        NPr = N // P
        # packed RHS: row m lanes [q*C1:(q+1)*C1] = pre[q*NPr + m]
        pre_p = jnp.pad(
            jnp.swapaxes(pre.reshape(B, P, NPr, C1), 1, 2
                         ).reshape(B, NPr, P * C1),
            ((0, 0), (0, 0), (0, 128 - P * C1)))
        pre_rows, pre_lanes = NPr, 128
    else:
        pre_p = jnp.pad(pre, ((0, 0), (0, Np - N), (0, C1p - C1)))
        pre_rows, pre_lanes = Np, C1p
    cb_p = jnp.pad(cbias.astype(dt), ((0, 0), (0, Sp - S), (0, C1p - C1)))
    w1_p = jnp.pad(w1.astype(dt), ((0, C1p - C1), (0, C2p - C2)))
    w2_p = jnp.pad(w2.astype(dt), ((0, C2p - C2), (0, C3p - C3)))
    b1_p = jnp.broadcast_to(jnp.pad(b1.astype(dt), (0, C2p - C2)),
                            (8, C2p))
    b2_p = jnp.broadcast_to(jnp.pad(b2.astype(dt), (0, C3p - C3)),
                            (8, C3p))

    # MXU rank operand (see ball_query_v2_pallas: Np=1024 only)
    use_tri = Np == 1024
    tri_in = []
    tri_specs = []
    if use_tri:
        tri = (jax.lax.broadcasted_iota(jnp.int32, (Np, Np), 0)
               <= jax.lax.broadcasted_iota(jnp.int32, (Np, Np), 1))
        # v4/v6 run the rank matmul int8 (exact, 2x MXU rate)
        tri = tri.astype(jnp.int8 if version >= 4 else jnp.bfloat16)
        tri_in = [tri]
        tri_specs = [pl.BlockSpec((Np, Np), lambda bb, s: (0, 0),
                                  memory_space=pltpu.VMEM)]

    # centroid-tile: the [st*K, Np/P] one-hot stack is the big VMEM tenant
    if interpret is None:
        interpret = not _on_tpu()
    if interpret:
        st = Sp  # no VMEM limit; fewer (Python-level) grid steps
    else:
        tri_bytes = (Np * Np * (1 if version == 4 else 2)
                     if use_tri else 0)
        budget = 4 * 1024 * 1024 - tri_bytes
        if version == 7:
            # per slot-row: sel i32 + oh bf16 (128 lanes) + the packed
            # gather output [*, Gn*C1] f32; rank/d2 are per-centroid
            # ([st, Np]) — amortize over nsample slots
            ohsz = 4 * 128 + 2 * 128 + 4 * pre_lanes + (8 * Np) // nsample
            # per-slot-row f32 MLP intermediates (h at C2p/C3p) + the
            # replicated cbias row at C1p live alongside the gather
            # output in EVERY dtype — without this term the tile choice
            # overshoots scoped VMEM at larger C2/C3 (ADVICE r4)
            ohsz += 4 * (C2p + C3p) + dsz * C1p
        elif version == 6:
            # same tiling as v2 (measured: smaller tiles cost more in
            # grid overhead than the naive VMEM accounting saves)
            ohsz = dsz * Np
        elif version == 4:
            ohsz = 2 * (Np // P)
        else:
            ohsz = dsz * Np
        if dsz == 4:
            # fp32 tiles also carry the 3-term bf16-split accumulators
            # and f32 MLP intermediates per one-hot row; without this
            # term the tile choice blows the 16 MiB scoped-VMEM stack
            # at C3p >= 256 (measured: v2 fp32 N=512 st=32 -> 16.11 MiB
            # OOM).  bf16 tilings (the raced defaults) are untouched.
            ohsz += 16 * C1p + 4 * (C1p + C2p + 2 * C3p)
        stk_cap = max(8, budget // max(ohsz, 1))
        st = min(Sp, max(8, stk_cap // nsample))
        while Sp % st:
            st -= 1
    grid = (B, Sp // st)
    if version == 7:
        kern = functools.partial(_fused_sa_kernel_v7, radius * radius,
                                 nsample, N, use_tri, C1)
    elif version == 6:
        kern = functools.partial(_fused_sa_kernel_v6, radius * radius,
                                 nsample, N, use_tri)
    elif version == 4:
        kern = functools.partial(_fused_sa_kernel_v4, radius * radius,
                                 nsample, N, use_tri, P, C1)
    else:
        kern = functools.partial(_fused_sa_kernel, radius * radius,
                                 nsample, N, use_tri)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, st, 8), lambda bb, s: (bb, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 8, Np), lambda bb, s: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + tri_specs + [
            pl.BlockSpec((None, pre_rows, pre_lanes),
                         lambda bb, s: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, st, C1p), lambda bb, s: (bb, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C1p, C2p), lambda bb, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, C2p), lambda bb, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C2p, C3p), lambda bb, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, C3p), lambda bb, s: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, st, C3p), lambda bb, s: (bb, s, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Sp, C3p), dt),
        interpret=interpret,
    )(new_p, xyz_t, *tri_in, pre_p, cb_p, w1_p, b1_p, w2_p, b2_p)
    return out[:, :S, :C3]


# --------------------------------- fused SA tail with precomputed indices


def _fused_sa_idx_kernel(nsample: int, idx_ref, pre_ref, cbias_ref,
                         w1_ref, b1_ref, w2_ref, b2_ref, out_ref):
    """Fused SA tail over PRECOMPUTED neighbor indices (kNN grouping).

    The ball-query family builds membership in-kernel (distance matmul +
    rank scan); kNN's global distance ordering is a top-K sort that XLA
    already does well, so this kernel takes idx [St, K] and only fuses
    the expensive half: one-hot build (a single [R, N] compare — cheaper
    than the ~3-pass ball-query build), MXU gather, BN-folded MLP, max.
    Every slot is a real neighbor (kNN always returns K), so none of the
    hit-count/zero-hit machinery of _fused_sa_kernel is needed.
    """
    St = cbias_ref.shape[0]
    Kp = idx_ref.shape[1]
    N = pre_ref.shape[0]
    K = nsample
    R = St * K

    # sel[r, 0] = idx[s, k] for r = s*K + k: mask-reduce over the
    # (128-padded) K lanes — one pass over [R, Kp]
    idxv = idx_ref[:]  # [St, Kp] int32
    rep = jnp.broadcast_to(idxv[:, None, :], (St, K, Kp)).reshape(R, Kp)
    lane_k = jax.lax.broadcasted_iota(jnp.int32, (R, Kp), 1)
    kv = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0) % K
    sel = jnp.sum(jnp.where(lane_k == kv, rep, 0), axis=1, keepdims=True)

    # one-hot gather rows: one compare pass over [R, N]
    lane_n = jax.lax.broadcasted_iota(jnp.int32, (R, N), 1)
    oh = lane_n == sel

    pre = pre_ref[:]  # [N, C1p], BN pre-folded
    dt = pre.dtype
    # same precision discipline as _fused_sa_kernel: the 0/1 one-hot is
    # exact in bf16; f32 `pre` gets the 3-term bf16 split
    prec = (jax.lax.Precision.HIGHEST if dt == jnp.float32 else
            jax.lax.Precision.DEFAULT)
    ohb = oh.astype(jnp.bfloat16)
    if dt == jnp.float32:
        hi = pre.astype(jnp.bfloat16)
        r1 = pre - hi.astype(jnp.float32)
        mid = r1.astype(jnp.bfloat16)
        lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
        g = (jnp.dot(ohb, hi, preferred_element_type=jnp.float32)
             + jnp.dot(ohb, mid, preferred_element_type=jnp.float32)
             + jnp.dot(ohb, lo, preferred_element_type=jnp.float32))
    else:
        g = jnp.dot(ohb, pre, preferred_element_type=jnp.float32)
    cb = cbias_ref[:]
    Cb = cb.shape[-1]
    cb_rep = jnp.broadcast_to(cb[:, None, :], (St, K, Cb)).reshape(R, Cb)
    h = jnp.maximum(g.astype(dt) + cb_rep, 0.0)
    h = jnp.dot(h, w1_ref[:], precision=prec,
                preferred_element_type=jnp.float32)
    h = jnp.maximum(h.astype(dt) + b1_ref[0:1, :], 0.0)
    h = jnp.dot(h, w2_ref[:], precision=prec,
                preferred_element_type=jnp.float32)
    h = jnp.maximum(h.astype(dt) + b2_ref[0:1, :], 0.0)
    out_ref[:] = jnp.max(h.reshape(St, K, h.shape[-1]), axis=1)


def fused_sa_idx_pallas(nsample: int, idx: jax.Array, pre: jax.Array,
                        cbias: jax.Array, w1: jax.Array, b1: jax.Array,
                        w2: jax.Array, b2: jax.Array,
                        interpret: bool = None) -> jax.Array:
    """Fused SA tail with precomputed indices -> [B, S, C3].

    Same folded-BN math as fused_sa_pallas but grouping by arbitrary
    idx [B,S,K] int32 (each row: K valid point indices, duplicates
    allowed) instead of an in-kernel ball query — serves the kNN model
    variant (models/registry.py pointnet2_cls_knn), whose top-K
    selection stays in XLA.  Exact vs the unfused composition at the
    usual fused-SA tolerances (f32: 3-term bf16 split ~2^-24 rel).
    K must be <= 128 (one padded lane tile); callers fall back to the
    unfused path otherwise.
    """
    B, S, K = idx.shape
    assert K == nsample and K <= 128, (K, nsample)
    N = pre.shape[1]
    C1, C2, C3 = pre.shape[-1], w1.shape[-1], w2.shape[-1]
    dt = pre.dtype
    dsz = jnp.dtype(dt).itemsize
    Np = _round_up(N, 128)
    Sp = _round_up(S, 8)
    Kp = 128
    C1p, C2p, C3p = (_round_up(c, 128) for c in (C1, C2, C3))

    # padded slot rows select point 0 (rows are trimmed after the call)
    idx_p = jnp.pad(idx.astype(jnp.int32),
                    ((0, 0), (0, Sp - S), (0, Kp - K)))
    pre_p = jnp.pad(pre, ((0, 0), (0, Np - N), (0, C1p - C1)))
    cb_p = jnp.pad(cbias.astype(dt), ((0, 0), (0, Sp - S), (0, C1p - C1)))
    w1_p = jnp.pad(w1.astype(dt), ((0, C1p - C1), (0, C2p - C2)))
    w2_p = jnp.pad(w2.astype(dt), ((0, C2p - C2), (0, C3p - C3)))
    b1_p = jnp.broadcast_to(jnp.pad(b1.astype(dt), (0, C2p - C2)), (8, C2p))
    b2_p = jnp.broadcast_to(jnp.pad(b2.astype(dt), (0, C3p - C3)), (8, C3p))

    if interpret is None:
        interpret = not _on_tpu()
    if interpret:
        st = Sp
    else:
        # VMEM tiling mirrors the v2 accounting: the [st*K, Np] one-hot
        # stack dominates; fp32 adds the bf16-split accumulators + f32
        # MLP intermediates per slot-row; the idx/sel bookkeeping adds
        # one i32 [R, Kp] tile
        ohsz = dsz * Np + 4 * Kp
        # the kernel's f32 matmul accumulators (g at C1p, h at C2p/C3p)
        # exist in EVERY dtype (preferred_element_type=f32) — same
        # omission the r4 ADVICE fix corrected for v7
        ohsz += 4 * (C1p + C2p + C3p) + dsz * C1p
        if dsz == 4:
            # fp32 additionally carries the 3-term bf16-split operands
            ohsz += 12 * C1p + 4 * C3p
        stk_cap = max(8, (4 * 1024 * 1024) // max(ohsz, 1))
        st = min(Sp, max(8, stk_cap // nsample))
        while Sp % st:
            st -= 1
    grid = (B, Sp // st)
    out = pl.pallas_call(
        functools.partial(_fused_sa_idx_kernel, nsample),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, st, Kp), lambda bb, s: (bb, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, Np, C1p), lambda bb, s: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, st, C1p), lambda bb, s: (bb, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C1p, C2p), lambda bb, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, C2p), lambda bb, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C2p, C3p), lambda bb, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, C3p), lambda bb, s: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, st, C3p), lambda bb, s: (bb, s, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Sp, C3p), dt),
        interpret=interpret,
    )(idx_p, pre_p, cb_p, w1_p, b1_p, w2_p, b2_p)
    return out[:, :S, :C3]


# ------------------------------------ fused bilinear image sampling kernel


def _bilinear_kernel(H: int, W: int, feat_ref, uv_ref, out_ref):
    """Per-point bilinear sampling as ONE sparse-matrix MXU matmul.

    Each point's interpolation is a 4-nonzero row over the flattened
    H*W pixel axis; the row is built on the VPU (4 compares + fma) and
    the gather+lerp collapses into a single [nt, HW] x [HW, C] matmul —
    no 4-corner gather round trip (BASELINE.json:5 "fused point->pixel
    projection + bilinear-sampling kernel"; SURVEY.md:89).
    """
    nt = uv_ref.shape[0]
    HWp = feat_ref.shape[0]
    u = uv_ref[:, 0:1]      # [nt, 1] f32
    v = uv_ref[:, 1:2]
    x0 = jnp.floor(u)
    y0 = jnp.floor(v)
    du = u - x0
    dv = v - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    hw = jax.lax.broadcasted_iota(jnp.int32, (nt, HWp), 1)

    wsp = jnp.zeros((nt, HWp), jnp.float32)
    for dx, dy, wgt in ((0, 0, (1 - du) * (1 - dv)),
                        (1, 0, du * (1 - dv)),
                        (0, 1, (1 - du) * dv),
                        (1, 1, du * dv)):
        xi = x0i + dx
        yi = y0i + dy
        inside = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        idx = jnp.where(inside, yi * W + xi, -1)
        wsp = wsp + jnp.where(hw == idx, wgt, 0.0)

    feat = feat_ref[:]
    prec = (jax.lax.Precision.HIGHEST if feat.dtype == jnp.float32 else
            jax.lax.Precision.DEFAULT)
    out_ref[:] = jnp.dot(wsp.astype(feat.dtype), feat, precision=prec,
                         preferred_element_type=jnp.float32
                         ).astype(out_ref.dtype)


def _three_interp_kernel(m_actual: int, pts_ref, idx_ref, wgt_ref,
                         out_ref):
    """Inverse-distance interpolation as ONE sparse-row MXU matmul.

    Each dense point's feature is a 3-nonzero weighted combination of
    sparse rows — the same shape as the bilinear image-sampling kernel
    (4 corners there, 3 neighbors here): build the [nt, M] sparse
    weight rows on the VPU, then one matmul against the sparse feature
    block.  f32 weights AND features each get a bf16 hi/lo split (one
    side exact is not available here), 3 matmuls ~1e-6 relative.
    SURVEY.md:87 ("fused Pallas gather+weighted-sum").
    """
    nt = idx_ref.shape[0]
    Mp = pts_ref.shape[0]
    m_iota = jax.lax.broadcasted_iota(jnp.int32, (nt, Mp), 1)
    wsp = jnp.zeros((nt, Mp), jnp.float32)
    for k in range(3):
        wsp = wsp + jnp.where(m_iota == idx_ref[:, k:k + 1],
                              wgt_ref[:, k:k + 1], 0.0)
    pts = pts_ref[:]
    if pts.dtype == jnp.float32:
        # 3-term bf16 split of BOTH operands, keeping the 6 cross
        # products above 2^-24: full-f32 fidelity (~1e-7 rel) at a
        # fraction of HIGHEST's cost and trivial FLOPs at FP shapes
        def split3(v):
            hi = v.astype(jnp.bfloat16)
            r1 = v - hi.astype(jnp.float32)
            mid = r1.astype(jnp.bfloat16)
            lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
            return hi, mid, lo

        wh, wm, wl = split3(wsp)
        ph, pm, plo = split3(pts)

        def d(a, b):
            return jnp.dot(a, b, preferred_element_type=jnp.float32)

        acc = (d(wh, ph) + d(wh, pm) + d(wh, plo)
               + d(wm, ph) + d(wm, pm) + d(wl, ph))
    else:
        acc = jnp.dot(wsp.astype(pts.dtype), pts,
                      preferred_element_type=jnp.float32)
    out_ref[:] = acc.astype(out_ref.dtype)


def three_interpolate_pallas_raw(points: jax.Array, idx: jax.Array,
                                 weight: jax.Array,
                                 interpret: bool = None) -> jax.Array:
    """points [B,M,C], idx [B,N,3] i32, weight [B,N,3] -> [B,N,C]."""
    B, M, C = points.shape
    N = idx.shape[1]
    Mp = _round_up(M, 8)
    Cp = _round_up(C, 128)
    Np_ = _round_up(N, 8)
    pts_p = jnp.pad(points, ((0, 0), (0, Mp - M), (0, Cp - C)))
    # pad idx with -1 (no sparse row matches) and weight with 0
    idx_p = jnp.pad(idx.astype(jnp.int32),
                    ((0, 0), (0, Np_ - N), (0, 125)), constant_values=-1)
    wgt_p = jnp.pad(weight.astype(jnp.float32),
                    ((0, 0), (0, Np_ - N), (0, 125)))
    if interpret is None:
        interpret = not _on_tpu()
    if interpret:
        nt = Np_
    else:
        budget = 4 * 1024 * 1024
        nt = min(Np_, max(8, (budget // (4 * Mp)) // 8 * 8))
        while Np_ % nt:
            nt -= 8
    grid = (B, Np_ // nt)
    out = pl.pallas_call(
        functools.partial(_three_interp_kernel, M),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, Mp, Cp), lambda b, n: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, nt, 128), lambda b, n: (b, n, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, nt, 128), lambda b, n: (b, n, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, nt, Cp), lambda b, n: (b, n, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Np_, Cp), points.dtype),
        interpret=interpret,
    )(pts_p, idx_p, wgt_p)
    return out[:, :N, :C]


@jax.custom_vjp
def three_interpolate_pallas(points: jax.Array, idx: jax.Array,
                             weight: jax.Array) -> jax.Array:
    return three_interpolate_pallas_raw(points, idx, weight)


def _three_interp_fwd(points, idx, weight):
    return three_interpolate_pallas_raw(points, idx, weight), \
        (points, idx, weight)


def _three_interp_bwd(res, g):
    # differentiate the equivalent pure-JAX form: d_points routes through
    # index_points' custom VJP (the Pallas scatter-add on TPU), d_weight
    # is a small gather-dot
    from mm3d_tpu.ops import geometry as _G
    points, idx, weight = res
    out, vjp = jax.vjp(_G._three_interpolate_jax, points, idx, weight)
    # the Pallas forward returns points.dtype while the JAX twin promotes
    # bf16 points to f32 (f32 interpolation weights), so the incoming
    # cotangent can be one dtype narrower than the twin's output — align
    # it (bf16->f32 is exact; vjp returns input-dtype cotangents)
    return vjp(g.astype(out.dtype))


three_interpolate_pallas.defvjp(_three_interp_fwd, _three_interp_bwd)


def bilinear_sample_pallas_raw(feat: jax.Array, uv: jax.Array,
                               interpret: bool = None) -> jax.Array:
    """feat [B,H,W,C], uv [B,N,2] pixel coords -> [B,N,C], zero-padded
    outside the frame (same contract as projection._bilinear_sample_jax)."""
    B, H, W, C = feat.shape
    N = uv.shape[1]
    HW = H * W
    HWp = _round_up(HW, 8)
    Cp = _round_up(C, 128)
    Np_ = _round_up(N, 8)
    featf = jnp.pad(feat.reshape(B, HW, C),
                    ((0, 0), (0, HWp - HW), (0, Cp - C)))
    # pad uv with -10 (far outside) so padded rows sample zero
    uvp = jnp.pad(uv.astype(jnp.float32), ((0, 0), (0, Np_ - N), (0, 126)),
                  constant_values=-10.0)
    budget = 4 * 1024 * 1024
    nt = min(Np_, max(8, (budget // (4 * HWp)) // 8 * 8))
    while Np_ % nt:
        nt -= 8
    grid = (B, Np_ // nt)
    if interpret is None:
        interpret = not _on_tpu()
    out = pl.pallas_call(
        functools.partial(_bilinear_kernel, H, W),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, HWp, Cp), lambda b, n: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, nt, 128), lambda b, n: (b, n, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, nt, Cp), lambda b, n: (b, n, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Np_, Cp), feat.dtype),
        interpret=interpret,
    )(featf, uvp)
    return out[:, :N, :C]


@jax.custom_vjp
def bilinear_sample_pallas(feat: jax.Array, uv: jax.Array) -> jax.Array:
    return bilinear_sample_pallas_raw(feat, uv)


def _bilinear_fwd(feat, uv):
    return bilinear_sample_pallas_raw(feat, uv), (feat, uv)


def _bilinear_bwd(res, g):
    # training path: differentiate the (equivalent) pure-JAX sampling —
    # gradients flow to both the feature map and the pixel coords
    from mm3d_tpu.ops import projection as _proj
    feat, uv = res
    out, vjp = jax.vjp(_proj._bilinear_sample_jax, feat, uv)
    # the Pallas forward returns feat.dtype while the JAX twin promotes
    # bf16 feat to f32 (f32 corner weights from uv), so bf16 training sent
    # a bf16 cotangent into an f32-output vjp (crashed fusion_semseg bf16
    # on chip) — align it; bf16->f32 is exact
    return vjp(g.astype(out.dtype))


bilinear_sample_pallas.defvjp(_bilinear_fwd, _bilinear_bwd)


# ---------------------------------------------- fused FP-tail kernel


def _fused_fp_kernel(m_actual: int, dense_ref, sparse_t_ref, pre_ref,
                     skip_ref, out_ref):
    """Whole FP-block tail in one Pallas call (eval mode):

        three_nn -> inverse-distance weights -> sparse-row interp matmul
        -> + skip/bias term -> relu

    Same design as the bilinear kernel: each dense point's interpolation
    is a 3-nonzero row over the sparse axis, built on the VPU from the
    three extract-min one-hots, and the gather+lerp collapses into ONE
    MXU matmul [nt, Mp] x [Mp, C1] — the [B,N,3,C] gathered tensor of
    the unfused composition never exists.  `pre` is the projected sparse
    features with eval-BN folded in (f2 @ W_interp, scaled); `skip` is
    the dense-side term ((f1 @ W_skip + bias) folded) computed outside —
    that matmul is dense and XLA-optimal already.

    Parity contract: identical math to geometry.three_nn +
    interpolation_weights (lineage eps 1e-8) + three_interpolate
    (tests/test_fused_fp.py).
    """
    Nt = dense_ref.shape[0]
    _, M = sparse_t_ref.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (Nt, M), 1)
    a = dense_ref[:]
    b = sparse_t_ref[:]
    cross = jnp.dot(a, b, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    a2 = jnp.sum(a * a, axis=1, keepdims=True)
    b2 = jnp.sum(b * b, axis=0, keepdims=True)
    d2 = a2 - 2.0 * cross + b2
    d2 = jnp.where(lane < m_actual, d2, jnp.inf)

    # 3-step extract-min (first-occurrence argmin, = lax.top_k order),
    # accumulating reciprocal-weighted one-hot rows
    rows = jnp.zeros((Nt, M), jnp.float32)
    rsum = jnp.zeros((Nt, 1), jnp.float32)
    for _ in range(3):
        minv = jnp.min(d2, axis=1, keepdims=True)
        oh = (d2 == minv) & (lane == jnp.min(
            jnp.where(d2 == minv, lane, M), axis=1, keepdims=True))
        val = jnp.sum(jnp.where(oh, d2, 0.0), axis=1, keepdims=True)
        r = 1.0 / (val + 1e-8)
        rows = rows + jnp.where(oh, r, 0.0)
        rsum = rsum + r
        d2 = jnp.where(oh, jnp.inf, d2)
    rows = rows * (1.0 / rsum)  # normalized inverse-distance weights

    pre = pre_ref[:]
    if pre.dtype == jnp.float32:
        interp = jnp.dot(rows, pre, precision=jax.lax.Precision.HIGHEST,
                         preferred_element_type=jnp.float32)
    else:
        interp = jnp.dot(rows.astype(jnp.bfloat16), pre,
                         preferred_element_type=jnp.float32)
    out_ref[:] = jnp.maximum(
        interp.astype(out_ref.dtype) + skip_ref[:], 0.0)


def fused_fp_pallas(xyz1: jax.Array, xyz2: jax.Array, pre: jax.Array,
                    skip: jax.Array, interpret: bool = None) -> jax.Array:
    """Fused FP tail: relu(three_interpolate(pre) + skip) in one kernel.

    Args:
      xyz1 [B,N,3] dense targets; xyz2 [B,M,3] sparse sources.
      pre  [B,M,C1]: projected sparse features (BN pre-folded).
      skip [B,N,C1]: dense-side additive term (skip-proj + bias, folded).
    Returns [B,N,C1].
    """
    B, N, _ = xyz1.shape
    M = xyz2.shape[1]
    C1 = pre.shape[-1]
    dt = pre.dtype
    Mp = _round_up(M, 128)
    Np = _round_up(N, 8)
    C1p = _round_up(C1, 128)
    dense = jnp.pad(xyz1.astype(jnp.float32), ((0, 0), (0, Np - N), (0, 5)))
    sparse_t = jnp.pad(
        jnp.swapaxes(xyz2.astype(jnp.float32), 1, 2),
        ((0, 0), (0, 5), (0, Mp - M)))
    pre_p = jnp.pad(pre, ((0, 0), (0, Mp - M), (0, C1p - C1)))
    skip_p = jnp.pad(skip.astype(dt), ((0, 0), (0, Np - N), (0, C1p - C1)))
    # Honest per-row live set (measured on chip at N=2048/M=512/C1=256:
    # Mosaic's scoped allocation was 15.5 KB/row, not the 4 KB the old
    # 2-array model assumed): ~6 f32 [nt, Mp] residents (lane iota,
    # cross, d2, rows, one-hot mask, where-temp) + the f32 interp tile
    # and the skip/out tiles at [nt, C1p].  Budget leaves ~1.5 MiB of
    # the 16 MiB scoped-VMEM stack for slack beyond the fixed residents
    # (pre [Mp, C1p], sparse_t, dense); calibrated so every previously
    # passing sweep shape keeps its raced tiling (e.g. N=4096/M=1024
    # stays nt=512, N=1024/M=512 stays nt=1024).
    dsz = jnp.dtype(dt).itemsize
    per_row = 24 * Mp + (4 + 2 * dsz) * C1p
    fixed = Mp * C1p * dsz + 32 * Mp + 32 * Np
    budget = int(14.5 * 1024 * 1024) - fixed
    nt_cap = max(8, budget // per_row)
    nt = Np
    while nt > nt_cap and nt % 2 == 0:
        nt //= 2
    grid = (B, Np // nt)
    if interpret is None:
        interpret = not _on_tpu()
    out = pl.pallas_call(
        functools.partial(_fused_fp_kernel, M),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, nt, 8), lambda b, s: (b, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 8, Mp), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, Mp, C1p), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, nt, C1p), lambda b, s: (b, s, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, nt, C1p), lambda b, s: (b, s, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Np, C1p), dt),
        interpret=interpret,
    )(dense, sparse_t, pre_p, skip_p)
    return out[:, :N, :C1]


# ------------------------------------------- gather backward (scatter-add)


def _gather_bwd_kernel(c_true, g_ref, idx_ref, out_ref):
    """Accumulate d_points[n] += g[f] for every f with idx[f] == n.

    The scatter-add transpose of the grouping gather, reformulated as a
    one-hot-transpose MXU matmul per index tile (SURVEY.md §7 hard part
    (c): "segment_sum layout, avoid serialized atomics-equivalent") —
    XLA's native scatter lowering serializes on TPU.  Output block is
    revisited across the f grid axis and accumulated in VMEM (f32).
    """
    f = pl.program_id(1)

    @pl.when(f == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    idx = idx_ref[:]        # [1, ft] i32, padding slots are -1
    g = g_ref[:]            # [ft, Cp]
    Np = out_ref.shape[0]
    Cp = out_ref.shape[1]
    n_iota = jax.lax.broadcasted_iota(jnp.int32, (Np, idx.shape[1]), 0)
    oh = (n_iota == idx).astype(jnp.bfloat16)
    if g.dtype == jnp.float32:
        # 0/1 one-hot is EXACT in bf16, so only g needs widening: split
        # g = hi + mid + lo (three bf16 terms ≈ full f32 mantissa) with
        # f32 accumulation — vs the 6 passes HIGHEST would spend
        # re-widening BOTH operands.  |err| ~ 2^-24 relative, far
        # inside the 1e-5 parity gates.  When the true channel count
        # fits in a 64-lane half tile (c_true <= 64, e.g. SA1's C=64 or
        # xyz's C=3), hi and mid ride ONE matmul side by side in the
        # otherwise-wasted lane padding — 2 matmuls instead of 3.
        hi = g.astype(jnp.bfloat16)
        r1 = g - hi.astype(jnp.float32)
        mid = r1.astype(jnp.bfloat16)
        lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
        if c_true <= 64 and Cp == 128:
            packed = jnp.concatenate(
                [hi[:, :64], mid[:, :64]], axis=1)  # [ft, 128]
            both = jnp.dot(oh, packed,
                           preferred_element_type=jnp.float32)
            acc = jnp.pad(both[:, :64] + both[:, 64:128],
                          ((0, 0), (0, Cp - 64)))
            acc = acc + jnp.dot(oh, lo,
                                preferred_element_type=jnp.float32)
        else:
            acc = (jnp.dot(oh, hi, preferred_element_type=jnp.float32)
                   + jnp.dot(oh, mid, preferred_element_type=jnp.float32)
                   + jnp.dot(oh, lo, preferred_element_type=jnp.float32))
    else:
        acc = jnp.dot(oh, g.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)
    out_ref[:] += acc


def gather_bwd_pallas(g: jax.Array, idx: jax.Array, n: int,
                      interpret: bool = None) -> jax.Array:
    """Backward of `index_points`: g [B, ..., C], idx [B, ...] -> [B, n, C].

    Duplicated indices accumulate (ball-query padding repeats hits).
    """
    B, C = g.shape[0], g.shape[-1]
    F = 1
    for d in idx.shape[1:]:
        F *= d
    dt = g.dtype
    dsz = jnp.dtype(dt).itemsize
    Fp = _round_up(F, 128)
    Cp = _round_up(C, 128)
    Np = _round_up(n, 8)
    gf = jnp.pad(g.reshape(B, F, C), ((0, 0), (0, Fp - F), (0, Cp - C)))
    # pad with -1: no output row matches, so padding contributes zero
    idxf = jnp.pad(idx.reshape(B, 1, F).astype(jnp.int32),
                   ((0, 0), (0, 0), (0, Fp - F)), constant_values=-1)
    if interpret is None:
        interpret = not _on_tpu()
    if interpret:
        ft = Fp
    else:
        budget = 4 * 1024 * 1024
        ft = min(Fp, max(128, (budget // (dsz * Np)) // 128 * 128))
        while Fp % ft:
            ft -= 128
    grid = (B, Fp // ft)
    out = pl.pallas_call(
        functools.partial(_gather_bwd_kernel, C),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, ft, Cp), lambda b, f: (b, f, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, ft), lambda b, f: (b, 0, f),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, Np, Cp), lambda b, f: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Np, Cp), jnp.float32),
        interpret=interpret,
    )(gf, idxf)
    return out[:, :n, :C].astype(dt)


def _register():
    dispatch.register_kernel("farthest_point_sample", fps_pallas)
    # v2 (rank-scan + MXU extraction) raced v1 (k-step extract-min) on
    # real v5e and won at every model shape: 1.4x @ SA1, 4.7x @ SA2,
    # 1.1x @ semseg — see scripts/proto_bq_v2.py
    dispatch.register_kernel("query_ball_point", ball_query_v2_pallas)
    dispatch.register_kernel("three_nn", three_nn_pallas)
    # three_interpolate_pallas is implemented + parity-tested but NOT
    # registered: raced on v5e at the semseg FP shape ([8,4096]<-1024,
    # C=256) it measured 0.54 ms vs XLA's 0.42 — the 6-pass f32
    # splitting outweighs what the 3-row gather fusion saves, and the
    # scatter-add BACKWARD (the expensive side) already routes through
    # gather_bwd_pallas via index_points' custom VJP either way.
    dispatch.register_kernel("fused_sa", fused_sa_pallas)
    dispatch.register_kernel("fused_sa_idx", fused_sa_idx_pallas)
    dispatch.register_kernel("fused_fp", fused_fp_pallas)
    dispatch.register_kernel("gather_backward", gather_bwd_pallas)
    dispatch.register_kernel("bilinear_sample", bilinear_sample_pallas)


_register()

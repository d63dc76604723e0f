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
    st_cap = max(8, (4 * 1024 * 1024) // (4 * Np))
    st = Sp
    while st > st_cap and st % 2 == 0:
        st //= 2
    grid = (B, Sp // st)
    if interpret is None:
        interpret = not _on_tpu()
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


def _register():
    dispatch.register_kernel("farthest_point_sample", fps_pallas)
    dispatch.register_kernel("query_ball_point", ball_query_pallas)
    dispatch.register_kernel("three_nn", three_nn_pallas)


_register()

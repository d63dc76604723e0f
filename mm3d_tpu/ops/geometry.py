"""Pure-JAX geometry ops for point-cloud networks (L0 of the stack).

Semantics follow the canonical pure-PyTorch PointNet++ op set (the
yanx27-style `pointnet2_utils` definitions; see SURVEY.md §2.1 — the
reference mount is empty, so the op contract is reconstructed from
BASELINE.json:5's north-star description and verified against a locally
re-typed torch-CPU oracle in `oracle/torch_ops.py`):

* ``farthest_point_sample`` — iterative max-min sampling, argmax ties
  broken toward the lowest index, deterministic seed point (index 0 by
  default; the torch lineage uses a random start — pass ``start_idx``).
* ``query_ball_point`` — indices of the first ``nsample`` points with
  squared distance <= radius**2, in ascending index order, padded by
  repeating the first hit.
* ``three_nn`` / ``three_interpolate`` — 3-NN inverse-distance-weighted
  feature propagation (eps 1e-8, matching the lineage).

All shapes are static; everything here is jit/vmap/grad-safe and runs on
any backend.  The Pallas TPU kernels in ``pallas_kernels.py`` replace the
hot ops behind the same API via ``dispatch``.

Conventions: points are channels-last ``[B, N, C]`` (TPU-friendly: the
channel axis maps to lanes); indices are int32.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from mm3d_tpu.ops import dispatch


def square_distance(src: jax.Array, dst: jax.Array) -> jax.Array:
    """Pairwise squared L2 distance.

    Args:
      src: [B, N, C]
      dst: [B, M, C]
    Returns:
      [B, N, M] squared distances.
    """
    # -2 src·dstᵀ + |src|² + |dst|²: one batched matmul (MXU) + rank-1 adds.
    # HIGHEST precision: index-producing ops compare these against radii, so
    # the default bf16 matmul pass on TPU would flip boundary decisions.
    cross = jnp.einsum("bnc,bmc->bnm", src, dst, precision=lax.Precision.HIGHEST)
    s2 = jnp.sum(src * src, axis=-1, keepdims=True)  # [B,N,1]
    d2 = jnp.sum(dst * dst, axis=-1, keepdims=True)  # [B,M,1]
    return s2 - 2.0 * cross + jnp.swapaxes(d2, -1, -2)


def _index_points_impl(points: jax.Array, idx: jax.Array) -> jax.Array:
    B, N, C = points.shape
    flat = points.reshape(B * N, C)
    offs = (jnp.arange(B, dtype=idx.dtype) * N).reshape(
        (B,) + (1,) * (idx.ndim - 1))
    out = jnp.take(flat, (idx + offs).reshape(-1), axis=0)
    return out.reshape(*idx.shape, C)


@jax.custom_vjp
def _index_points_cv(points: jax.Array, idx: jax.Array) -> jax.Array:
    return _index_points_impl(points, idx)


def _index_points_fwd(points, idx):
    return _index_points_impl(points, idx), (idx, points.shape[1])


def _index_points_bwd(res, g):
    idx, n = res
    kern = dispatch.kernel_or_none("gather_backward")
    if kern is not None:
        # TPU: one-hot-transpose MXU matmul kernel — XLA's scatter-add
        # transpose of the gather serializes (SURVEY.md §7(c))
        d = kern(g, idx, n)
    else:
        B = g.shape[0]
        C = g.shape[-1]
        flat = jnp.zeros((B * n, C), g.dtype)
        offs = (jnp.arange(B, dtype=idx.dtype) * n).reshape(
            (B,) + (1,) * (idx.ndim - 1))
        d = flat.at[(idx + offs).reshape(-1)].add(
            g.reshape(-1, C)).reshape(B, n, C)
    import numpy as _np
    return d, _np.zeros(idx.shape, jax.dtypes.float0)


_index_points_cv.defvjp(_index_points_fwd, _index_points_bwd)


def index_points(points: jax.Array, idx: jax.Array) -> jax.Array:
    """Batched gather: points[B,N,C], idx[B,...] -> [B,...,C].

    Implemented as one flat row-gather over [B*N, C] (global indices):
    on TPU this lowers to a single large dynamic-gather, measured ~2x
    faster than per-batch take_along_axis for the small-C point clouds
    these models gather.  Carries a custom VJP whose backward is the
    Pallas one-hot-transpose matmul on TPU (the training bottleneck —
    VERDICT r1 item 3) and an explicit flat scatter-add elsewhere.
    """
    return _index_points_cv(points, idx)


def index_points_onehot(points: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather reformulated as a one-hot matmul (MXU-friendly for small N).

    Same contract as :func:`index_points`.  Useful inside fused blocks
    where the gather feeds a matmul anyway; costs O(F·N·C) FLOPs.
    """
    B, N, C = points.shape
    idx_flat = idx.reshape(B, -1)
    onehot = jax.nn.one_hot(idx_flat, N, dtype=points.dtype)  # [B,F,N]
    out = jnp.einsum(
        "bfn,bnc->bfc", onehot, points, precision=lax.Precision.HIGHEST
    )
    return out.reshape(*idx.shape, C)


def _fps_jax(xyz: jax.Array, npoint: int, start_idx=0) -> jax.Array:
    """Pure-JAX farthest point sampling. xyz [B,N,3] -> idx [B,npoint] int32."""
    B, N, _ = xyz.shape
    if isinstance(start_idx, int):
        far0 = jnp.full((B,), start_idx, jnp.int32)
    else:
        # accept numpy/jax scalars AND per-batch [B] vectors: a bare
        # np.int64 start (the natural lineage-parity call) used to die
        # in .reshape(B) for B>1 (code-review r5)
        far0 = jnp.broadcast_to(
            jnp.asarray(start_idx, jnp.int32).reshape(-1), (B,))

    def body(i, state):
        dist, far, idxs = state
        idxs = lax.dynamic_update_index_in_dim(idxs, far, i, axis=1)
        centroid = jnp.take_along_axis(xyz, far[:, None, None], axis=1)  # [B,1,3]
        d = jnp.sum(jnp.square(xyz - centroid), axis=-1)  # [B,N]
        dist = jnp.minimum(dist, d)
        far = jnp.argmax(dist, axis=-1).astype(jnp.int32)
        return dist, far, idxs

    dist0 = jnp.full((B, N), 1e10, xyz.dtype)
    idxs0 = jnp.zeros((B, npoint), jnp.int32)
    _, _, idxs = lax.fori_loop(0, npoint, body, (dist0, far0, idxs0))
    return idxs


def farthest_point_sample(xyz: jax.Array, npoint: int, start_idx=0) -> jax.Array:
    """Iterative farthest point sampling.

    Args:
      xyz: [B, N, 3] coordinates.
      npoint: number of samples (static).
      start_idx: seed index — int or [B] int array.  The torch lineage
        seeds with randint; pass the same value to both for parity.
    Returns:
      [B, npoint] int32 indices into N.
    """
    fn = dispatch.resolve("farthest_point_sample", _fps_jax)
    return fn(xyz, npoint, start_idx)


def _query_ball_jax(radius: float, nsample: int, xyz: jax.Array,
                    new_xyz: jax.Array) -> jax.Array:
    """Pure-JAX ball query. -> [B, S, nsample] int32."""
    N = xyz.shape[1]
    sqr = square_distance(new_xyz, xyz)  # [B,S,N]
    arange = lax.broadcasted_iota(jnp.int32, sqr.shape, 2)
    # Lineage semantics: indices with d² > r² are pushed to sentinel N,
    # then the nsample smallest indices are kept (ascending index order).
    cand = jnp.where(sqr > radius * radius, N, arange)
    # top_k of negated values == k smallest, ascending after negation.
    k = min(nsample, N)
    neg_vals, _ = lax.top_k(-cand, k)
    idx = -neg_vals  # ascending
    if k < nsample:  # nsample > N: fixed output shape, pad with sentinel
        pad = jnp.full(idx.shape[:-1] + (nsample - k,), N, idx.dtype)
        idx = jnp.concatenate([idx, pad], axis=-1)
    first = idx[..., :1]
    # Pad empty slots (sentinel N) with the first hit.  If the centroid is
    # one of the points (always true in sample_and_group) there is >=1 hit.
    out = jnp.where(idx == N, first, idx)
    # Zero-hit centroids (possible via the public API when new_xyz is not
    # a subset of xyz) would otherwise return the out-of-range sentinel N
    # and silently rely on take()'s clipping downstream; clamp to index 0.
    return jnp.where(out == N, 0, out)


def query_ball_point(radius: float, nsample: int, xyz: jax.Array,
                     new_xyz: jax.Array) -> jax.Array:
    """Fixed-size ball query: first `nsample` point indices within `radius`
    of each centroid (ascending), padded by repeating the first hit.

    Args:
      radius: ball radius (points at exactly radius are included).
      nsample: neighbors per centroid (static).
      xyz: [B, N, 3] all points.
      new_xyz: [B, S, 3] centroids.
    Returns:
      [B, S, nsample] int32.
    """
    fn = dispatch.resolve("query_ball_point", _query_ball_jax)
    return fn(radius, nsample, xyz, new_xyz)


def knn_point(nsample: int, xyz: jax.Array, new_xyz: jax.Array) -> jax.Array:
    """k nearest neighbors of each centroid. -> [B, S, nsample] int32,
    ascending distance, ties broken toward the lowest index."""
    sqr = square_distance(new_xyz, xyz)  # [B,S,N]
    _, idx = lax.top_k(-sqr, nsample)
    return idx.astype(jnp.int32)


def _three_nn_jax(xyz1: jax.Array, xyz2: jax.Array) -> Tuple[jax.Array, jax.Array]:
    sqr = square_distance(xyz1, xyz2)  # [B,N,M]
    neg_vals, idx = lax.top_k(-sqr, 3)
    return -neg_vals, idx.astype(jnp.int32)


def three_nn(xyz1: jax.Array, xyz2: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """3 nearest neighbors of each dense point among the sparse set.

    Args:
      xyz1: [B, N, 3] dense (interpolation targets).
      xyz2: [B, M, 3] sparse (feature sources).
    Returns:
      (dists [B,N,3] squared distances ascending, idx [B,N,3] int32).
    """
    fn = dispatch.resolve("three_nn", _three_nn_jax)
    return fn(xyz1, xyz2)


def interpolation_weights(dists: jax.Array) -> jax.Array:
    """Inverse-distance weights from squared 3-NN distances (lineage eps 1e-8)."""
    recip = 1.0 / (dists + 1e-8)
    return recip / jnp.sum(recip, axis=-1, keepdims=True)


def _three_interpolate_jax(points: jax.Array, idx: jax.Array,
                           weight: jax.Array) -> jax.Array:
    gathered = index_points(points, idx)  # [B,N,3,C]
    return jnp.sum(gathered * weight[..., None], axis=2)


def _three_interpolate_onehot(points: jax.Array, idx: jax.Array,
                              weight: jax.Array) -> jax.Array:
    """Interpolation as one sparse-as-dense matmul: W[B,N,M] @ points[B,M,C].

    TPU-idiomatic: replaces gather+reduce with an MXU matmul whose
    transpose (the scatter-add backward) also lowers to a matmul under AD.
    Prefer for small M (sparse level sizes are 16..512 in this family).
    """
    B, M, _ = points.shape
    m_iota = lax.broadcasted_iota(jnp.int32, (1, 1, 1, M), 3)
    w = jnp.sum(
        jnp.where(idx[..., None] == m_iota, weight[..., None], 0.0), axis=2
    )  # [B,N,M]
    return jnp.einsum(
        "bnm,bmc->bnc", w, points.astype(w.dtype),
        precision=lax.Precision.HIGHEST,
    )


def three_interpolate(points: jax.Array, idx: jax.Array,
                      weight: jax.Array) -> jax.Array:
    """Weighted 3-NN feature interpolation.

    Args:
      points: [B, M, C] sparse features.
      idx: [B, N, 3] int32 neighbor indices (from three_nn).
      weight: [B, N, 3] normalized weights.
    Returns:
      [B, N, C] interpolated features.  Backward is the scatter-add.
    """
    fn = dispatch.resolve("three_interpolate", _three_interpolate_jax)
    return fn(points, idx, weight)


def sample_and_group(
    npoint: int,
    radius: float,
    nsample: int,
    xyz: jax.Array,
    points: Optional[jax.Array],
    return_fps: bool = False,
    fps_start_idx=0,
):
    """FPS -> ball query -> gather -> recenter -> concat features.

    Args:
      xyz: [B, N, 3]; points: [B, N, D] extra features or None.
    Returns:
      new_xyz [B, npoint, 3], new_points [B, npoint, nsample, 3+D]
      (+ grouped_xyz_norm, fps_idx if return_fps).
    """
    fps_idx = farthest_point_sample(xyz, npoint, fps_start_idx)
    new_xyz = index_points(xyz, fps_idx)  # [B,S,3]
    idx = query_ball_point(radius, nsample, xyz, new_xyz)
    grouped_xyz = index_points(xyz, idx)  # [B,S,K,3]
    grouped_xyz_norm = grouped_xyz - new_xyz[:, :, None, :]
    if points is not None:
        grouped_points = index_points(points, idx)
        new_points = jnp.concatenate([grouped_xyz_norm, grouped_points], axis=-1)
    else:
        new_points = grouped_xyz_norm
    if return_fps:
        # lineage semantics: the third value is the UN-normalized
        # grouped_xyz (the recentered twin has the same shape and would
        # silently mislead ported lineage code — code-review r5)
        return new_xyz, new_points, grouped_xyz, fps_idx
    return new_xyz, new_points


def sample_and_group_all(xyz: jax.Array, points: Optional[jax.Array]):
    """Group-all: every point in one group around the origin.

    Returns new_xyz [B,1,3] zeros, new_points [B,1,N,3+D].
    """
    B, N, _ = xyz.shape
    new_xyz = jnp.zeros((B, 1, 3), xyz.dtype)
    grouped_xyz = xyz[:, None, :, :]
    if points is not None:
        new_points = jnp.concatenate(
            [grouped_xyz, points[:, None, :, :]], axis=-1
        )
    else:
        new_points = grouped_xyz
    return new_xyz, new_points

"""Point-axis-sharded ball query / SA tail == single-device semantics
(8-device CPU mesh; SURVEY.md §2.5 SP row, VERDICT r1 item 5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mm3d_tpu.ops import geometry as G
from mm3d_tpu.parallel import make_mesh
from mm3d_tpu.parallel.sharded_group import (sharded_ball_query,
                                             sharded_sa_group_max)


def _cloud(seed, B, N, S, scale=0.5):
    rng = np.random.RandomState(seed)
    xyz = jnp.asarray(rng.randn(B, N, 3).astype(np.float32) * scale)
    fidx = G.farthest_point_sample(xyz, S)
    new_xyz = G.index_points(xyz, fidx)
    return rng, xyz, new_xyz


@pytest.mark.parametrize("n_dev,B,N,S,K,radius", [
    (8, 2, 512, 64, 16, 0.3),
    (4, 1, 256, 32, 8, 0.15),   # small radius -> sparse / zero-hit rows
    (8, 2, 512, 64, 64, 1.2),   # K > hit count -> padding semantics
])
def test_sharded_ball_query_exact(n_dev, B, N, S, K, radius):
    mesh = make_mesh(jax.devices()[:n_dev], data_parallel=n_dev)
    _, xyz, new_xyz = _cloud(0, B, N, S)
    got = np.asarray(jax.jit(
        lambda a, b: sharded_ball_query(radius, K, a, b, mesh))(
            xyz, new_xyz))
    want = np.asarray(G.query_ball_point(radius, K, xyz, new_xyz))
    np.testing.assert_array_equal(got, want)


def test_sharded_ball_query_zero_hit_row():
    mesh = make_mesh(jax.devices()[:4], data_parallel=4)
    _, xyz, new_xyz = _cloud(1, 2, 256, 16)
    new_xyz = new_xyz.at[:, 0].set(50.0)  # no neighbors in radius
    got = np.asarray(sharded_ball_query(0.3, 8, xyz, new_xyz, mesh))
    want = np.asarray(G.query_ball_point(0.3, 8, xyz, new_xyz))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("n_dev,B,N,S,K,radius", [
    (8, 2, 512, 64, 16, 0.3),
    (4, 1, 256, 32, 8, 0.15),
])
def test_sharded_sa_tail_matches_single_device(n_dev, B, N, S, K, radius):
    mesh = make_mesh(jax.devices()[:n_dev], data_parallel=n_dev)
    rng, xyz, new_xyz = _cloud(2, B, N, S)
    C1, C2, C3 = 16, 24, 32
    pre = jnp.asarray(rng.randn(B, N, C1).astype(np.float32))
    cb = jnp.asarray(rng.randn(B, S, C1).astype(np.float32))
    w1 = jnp.asarray(rng.randn(C1, C2).astype(np.float32) * 0.3)
    b1 = jnp.asarray(rng.randn(C2).astype(np.float32))
    w2 = jnp.asarray(rng.randn(C2, C3).astype(np.float32) * 0.3)
    b2 = jnp.asarray(rng.randn(C3).astype(np.float32))

    idx = G.query_ball_point(radius, K, xyz, new_xyz)
    g = G.index_points(pre, idx)
    h = jax.nn.relu(g + cb[:, :, None, :])
    h = jax.nn.relu(h @ w1 + b1)
    h = jax.nn.relu(h @ w2 + b2)
    want = np.asarray(jnp.max(h, axis=2))

    got = np.asarray(jax.jit(
        lambda *a: sharded_sa_group_max(radius, K, *a, mesh=mesh))(
            xyz, new_xyz, pre, cb, w1, b1, w2, b2))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_sharded_sa_tail_zero_hit_row():
    mesh = make_mesh(jax.devices()[:4], data_parallel=4)
    rng, xyz, new_xyz = _cloud(3, 2, 256, 16)
    new_xyz = new_xyz.at[:, 3].set(50.0)
    C1, C2, C3 = 8, 8, 8
    pre = jnp.asarray(rng.randn(2, 256, C1).astype(np.float32))
    cb = jnp.asarray(rng.randn(2, 16, C1).astype(np.float32))
    w1 = jnp.asarray(rng.randn(C1, C2).astype(np.float32) * 0.3)
    b1 = jnp.asarray(rng.randn(C2).astype(np.float32))
    w2 = jnp.asarray(rng.randn(C2, C3).astype(np.float32) * 0.3)
    b2 = jnp.asarray(rng.randn(C3).astype(np.float32))

    idx = G.query_ball_point(0.3, 8, xyz, new_xyz)
    g = G.index_points(pre, idx)
    h = jax.nn.relu(g + cb[:, :, None, :])
    h = jax.nn.relu(h @ w1 + b1)
    h = jax.nn.relu(h @ w2 + b2)
    want = np.asarray(jnp.max(h, axis=2))

    got = np.asarray(sharded_sa_group_max(
        0.3, 8, xyz, new_xyz, pre, cb, w1, b1, w2, b2, mesh=mesh))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_sharded_fp_matches_single_device():
    mesh = make_mesh(jax.devices()[:8], data_parallel=8)
    from mm3d_tpu.parallel.sharded_group import sharded_fp
    from mm3d_tpu.ops import geometry as G
    rng = np.random.RandomState(5)
    B, N, M, C1 = 2, 512, 64, 32
    xyz1 = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
    xyz2 = jnp.asarray(rng.randn(B, M, 3).astype(np.float32))
    pre = jnp.asarray(rng.randn(B, M, C1).astype(np.float32))
    skip = jnp.asarray(rng.randn(B, N, C1).astype(np.float32))
    d, idx = G._three_nn_jax(xyz1, xyz2)
    w = G.interpolation_weights(d)
    want = np.asarray(jax.nn.relu(
        G._three_interpolate_jax(pre, idx, w) + skip))
    got = np.asarray(sharded_fp(xyz1, xyz2, pre, skip, mesh))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("n_dev,B,N,S,K", [
    (8, 2, 512, 64, 16),
    (8, 2, 512, 64, 64),   # K == tile size (the sharding boundary)
])
def test_sharded_knn_exact(n_dev, B, N, S, K):
    """sharded_knn_point == ops.knn_point including the ascending-
    distance order and lowest-global-index tie-break (r5: the kNN
    variant joins the point-sharded story)."""
    from mm3d_tpu.parallel.sharded_group import sharded_knn_point
    mesh = make_mesh(jax.devices()[:n_dev], data_parallel=n_dev)
    _, xyz, new_xyz = _cloud(5, B, N, S)
    got = np.asarray(jax.jit(
        lambda a, b: sharded_knn_point(K, a, b, mesh))(xyz, new_xyz))
    want = np.asarray(G.knn_point(K, xyz, new_xyz))
    np.testing.assert_array_equal(got, want)


def test_sharded_knn_tie_break():
    """Duplicate points force distance ties across shard boundaries."""
    from mm3d_tpu.parallel.sharded_group import sharded_knn_point
    mesh = make_mesh(jax.devices()[:4], data_parallel=4)
    rng = np.random.RandomState(6)
    base = rng.randn(1, 64, 3).astype(np.float32)
    xyz = jnp.asarray(np.tile(base, (1, 4, 1)))  # every point 4x, one
    new_xyz = jnp.asarray(base[:, :16])          # copy in every shard
    got = np.asarray(jax.jit(
        lambda a, b: sharded_knn_point(8, a, b, mesh))(xyz, new_xyz))
    want = np.asarray(G.knn_point(8, xyz, new_xyz))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("n_dev,B,N,S,K", [
    (8, 2, 512, 64, 16),
])
def test_sharded_idx_tail_matches_single_device(n_dev, B, N, S, K):
    from mm3d_tpu.parallel.sharded_group import (sharded_idx_group_max,
                                                 sharded_knn_point)
    mesh = make_mesh(jax.devices()[:n_dev], data_parallel=n_dev)
    rng, xyz, new_xyz = _cloud(7, B, N, S)
    C1, C2, C3 = 16, 16, 32
    pre = jnp.asarray(rng.randn(B, N, C1).astype(np.float32))
    cb = jnp.asarray(rng.randn(B, S, C1).astype(np.float32))
    w1 = jnp.asarray(rng.randn(C1, C2).astype(np.float32) * .3)
    b1 = jnp.asarray(rng.randn(C2).astype(np.float32))
    w2 = jnp.asarray(rng.randn(C2, C3).astype(np.float32) * .3)
    b2 = jnp.asarray(rng.randn(C3).astype(np.float32))
    idx = G.knn_point(K, xyz, new_xyz)
    got = np.asarray(jax.jit(
        lambda i, p: sharded_idx_group_max(i, p, cb, w1, b1, w2, b2,
                                           mesh))(idx, pre))
    g = G.index_points(pre, idx)
    h = jax.nn.relu(g + cb[:, :, None, :])
    h = jax.nn.relu(h @ w1 + b1)
    h = jax.nn.relu(h @ w2 + b2)
    want = np.asarray(jnp.max(h, axis=2))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_knn_model_point_sharded_eval_matches_single_device():
    """Whole-model: the kNN cls variant under point_shard matches the
    single-device forward (sa1 N=1024 shards; sa2 N=512 with K=64 needs
    tile>=K -> 8 shards give tile 64, exactly at the boundary)."""
    from mm3d_tpu import parallel
    from mm3d_tpu.models import get_model
    from _helpers import jit_init
    mesh = parallel.make_mesh(jax.devices()[:8], data_parallel=8)
    spec = get_model("pointnet2_cls_knn")
    model = spec.builder(num_class=10)
    r = np.random.RandomState(8)
    pts = jnp.asarray(r.randn(2, 1024, 3).astype(np.float32) * 0.5)
    variables = jit_init(model, {"params": jax.random.PRNGKey(0),
                                 "dropout": jax.random.PRNGKey(1)},
                         pts, train=True)
    ref, _ = jax.jit(lambda v, p: model.apply(v, p, train=False))(
        variables, pts)
    with parallel.point_shard(mesh, min_points=512):
        out, _ = jax.jit(lambda v, p: model.apply(v, p, train=False))(
            variables, pts)
    err = np.abs(np.asarray(out) - np.asarray(ref)).max()
    assert err <= 1e-5, err

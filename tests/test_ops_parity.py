"""L0 geometry ops vs the torch-CPU oracle (SURVEY.md §4.1).

Index-producing ops must match exactly away from fp boundaries;
float ops within fp32 tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from mm3d_tpu import ops
from oracle import torch_ops as tops


def clouds(b=4, n=256, c=3, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randn(b, n, c).astype(np.float32)


def test_square_distance():
    src, dst = clouds(2, 128, 3, 0), clouds(2, 96, 3, 1)
    got = np.asarray(ops.square_distance(jnp.asarray(src), jnp.asarray(dst)))
    want = tops.square_distance(torch.from_numpy(src), torch.from_numpy(dst)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_index_points_2d_and_3d():
    pts = clouds(3, 64, 8)
    rng = np.random.RandomState(2)
    for shape in [(3, 10), (3, 10, 5)]:
        idx = rng.randint(0, 64, size=shape).astype(np.int32)
        got = np.asarray(ops.index_points(jnp.asarray(pts), jnp.asarray(idx)))
        want = tops.index_points(
            torch.from_numpy(pts), torch.from_numpy(idx.astype(np.int64))
        ).numpy()
        np.testing.assert_array_equal(got, want)
        got_oh = np.asarray(
            ops.geometry.index_points_onehot(jnp.asarray(pts), jnp.asarray(idx))
        )
        np.testing.assert_allclose(got_oh, want, rtol=1e-6, atol=1e-5)


@pytest.mark.parametrize("n,npoint", [(256, 64), (511, 128), (1024, 512)])
def test_fps_exact(n, npoint):
    xyz = clouds(3, n, 3, seed=n)
    got = np.asarray(ops.farthest_point_sample(jnp.asarray(xyz), npoint))
    want = tops.farthest_point_sample(torch.from_numpy(xyz), npoint).numpy()
    np.testing.assert_array_equal(got, want.astype(np.int32))


def test_fps_custom_start():
    xyz = clouds(2, 200, 3, seed=9)
    starts = np.array([7, 100], np.int32)
    got = np.asarray(
        ops.farthest_point_sample(jnp.asarray(xyz), 32, jnp.asarray(starts))
    )
    want = tops.farthest_point_sample(torch.from_numpy(xyz), 32, starts).numpy()
    np.testing.assert_array_equal(got, want.astype(np.int32))


@pytest.mark.parametrize("radius,nsample", [(0.5, 16), (1.2, 32), (0.1, 8)])
def test_query_ball_exact_away_from_boundary(radius, nsample):
    xyz = clouds(3, 256, 3, seed=5)
    s_idx = np.random.RandomState(6).choice(256, 64, replace=False)
    new_xyz = xyz[:, s_idx]
    got = np.asarray(
        ops.query_ball_point(radius, nsample, jnp.asarray(xyz), jnp.asarray(new_xyz))
    )
    want = tops.query_ball_point(
        radius, nsample, torch.from_numpy(xyz), torch.from_numpy(new_xyz)
    ).numpy()
    # fp32 matmul rounding may flip membership exactly at |d²−r²|≈0; require
    # exactness everywhere the decision margin is clear.
    d2 = tops.square_distance(
        torch.from_numpy(new_xyz), torch.from_numpy(xyz)
    ).numpy()
    boundary = np.abs(d2 - radius * radius) < 1e-4  # [B,S,N]
    row_clear = ~boundary.any(-1)  # [B,S]
    assert row_clear.mean() > 0.9  # the test must actually bite
    np.testing.assert_array_equal(got[row_clear], want[row_clear].astype(np.int32))


def test_query_ball_padding_semantics():
    # One distant centroid with a single in-radius point: all slots repeat it.
    xyz = np.zeros((1, 8, 3), np.float32)
    xyz[0, :, 0] = np.arange(8)
    new_xyz = np.array([[[5.1, 0.0, 0.0]]], np.float32)
    got = np.asarray(ops.query_ball_point(0.2, 4, jnp.asarray(xyz), jnp.asarray(new_xyz)))
    want = tops.query_ball_point(
        0.2, 4, torch.from_numpy(xyz), torch.from_numpy(new_xyz)
    ).numpy()
    np.testing.assert_array_equal(got, want.astype(np.int32))
    assert (got == 5).all()


def test_knn():
    xyz = clouds(2, 128, 3, seed=11)
    new_xyz = clouds(2, 32, 3, seed=12)
    got = np.asarray(ops.knn_point(8, jnp.asarray(xyz), jnp.asarray(new_xyz)))
    want = tops.knn_point(8, torch.from_numpy(xyz), torch.from_numpy(new_xyz)).numpy()
    np.testing.assert_array_equal(got, want.astype(np.int32))


def test_three_nn_and_interpolate():
    dense = clouds(2, 128, 3, seed=20)
    sparse = clouds(2, 32, 3, seed=21)
    feats = clouds(2, 32, 16, seed=22)
    gd, gi = ops.three_nn(jnp.asarray(dense), jnp.asarray(sparse))
    wd, wi = tops.three_nn(torch.from_numpy(dense), torch.from_numpy(sparse))
    np.testing.assert_array_equal(np.asarray(gi), wi.numpy().astype(np.int32))
    np.testing.assert_allclose(np.asarray(gd), wd.numpy(), rtol=1e-5, atol=1e-4)

    w_j = ops.geometry.interpolation_weights(gd)
    w_t = tops.interpolation_weights(wd)
    got = np.asarray(ops.three_interpolate(jnp.asarray(feats), gi, w_j))
    want = tops.three_interpolate(
        torch.from_numpy(feats), wi, w_t
    ).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    # one-hot matmul formulation agrees with the gather formulation
    got_oh = np.asarray(
        ops.geometry._three_interpolate_onehot(jnp.asarray(feats), gi, w_j)
    )
    np.testing.assert_allclose(got_oh, got, rtol=1e-5, atol=1e-5)


def test_three_interpolate_grad_is_scatter_add():
    # Backward of interpolate w.r.t. sparse features == scatter-add of
    # weighted cotangents; check against numerical expectation.
    feats = jnp.asarray(clouds(1, 16, 4, seed=30))
    dense = jnp.asarray(clouds(1, 64, 3, seed=31))
    sparse = jnp.asarray(clouds(1, 16, 3, seed=32))
    d, i = ops.three_nn(dense, sparse)
    w = ops.geometry.interpolation_weights(d)

    def f(p):
        return jnp.sum(ops.three_interpolate(p, i, w) ** 2)

    g = jax.grad(f)(feats)
    out = ops.three_interpolate(feats, i, w)
    ct = 2 * out  # [B,N,C]
    expect = np.zeros(feats.shape, np.float32)
    i_np, w_np, ct_np = np.asarray(i), np.asarray(w), np.asarray(ct)
    for n in range(64):
        for j in range(3):
            expect[0, i_np[0, n, j]] += w_np[0, n, j] * ct_np[0, n]
    np.testing.assert_allclose(np.asarray(g), expect, rtol=1e-4, atol=1e-4)


def test_sample_and_group_matches_oracle():
    xyz = clouds(2, 256, 3, seed=40)
    feats = clouds(2, 256, 6, seed=41)
    gx, gp = ops.sample_and_group(64, 0.4, 16, jnp.asarray(xyz), jnp.asarray(feats))
    wx, wp = tops.sample_and_group(
        64, 0.4, 16, torch.from_numpy(xyz), torch.from_numpy(feats)
    )
    np.testing.assert_allclose(np.asarray(gx), wx.numpy(), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gp), wp.numpy(), rtol=1e-5, atol=1e-4)


def test_sample_and_group_all():
    xyz = clouds(2, 64, 3, seed=50)
    feats = clouds(2, 64, 5, seed=51)
    gx, gp = ops.sample_and_group_all(jnp.asarray(xyz), jnp.asarray(feats))
    wx, wp = tops.sample_and_group_all(
        torch.from_numpy(xyz), torch.from_numpy(feats)
    )
    np.testing.assert_allclose(np.asarray(gx), wx.numpy())
    np.testing.assert_allclose(np.asarray(gp), wp.numpy(), rtol=1e-6, atol=1e-6)


def test_ops_jit_and_vmap_safe():
    xyz = jnp.asarray(clouds(2, 128, 3, seed=60))
    jf = jax.jit(lambda x: ops.farthest_point_sample(x, 32))
    np.testing.assert_array_equal(
        np.asarray(jf(xyz)), np.asarray(ops.farthest_point_sample(xyz, 32))
    )
    qb = jax.jit(
        lambda x, s: ops.query_ball_point(0.5, 8, x, s), static_argnums=()
    )
    s = xyz[:, :16]
    np.testing.assert_array_equal(
        np.asarray(qb(xyz, s)), np.asarray(ops.query_ball_point(0.5, 8, xyz, s))
    )

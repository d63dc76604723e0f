"""Pallas kernels vs pure-JAX reference (interpret mode on CPU).

Exact index-level parity is required (SURVEY.md §4.1).  Real-TPU parity
(including vs the torch oracle) is exercised by scripts/run_tpu_checks.py
since these tests run on the CPU backend.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mm3d_tpu.ops import pallas_kernels as pk
from mm3d_tpu.ops.geometry import _fps_jax, _query_ball_jax
from mm3d_tpu.ops import dispatch, farthest_point_sample


def _xyz(b, n, seed=0):
    return jnp.asarray(np.random.RandomState(seed).randn(b, n, 3).astype(np.float32))


@pytest.mark.parametrize("b,n,npoint", [(4, 256, 64), (3, 511, 128),
                                        (2, 1024, 512), (1, 128, 128)])
def test_fps_pallas_exact(b, n, npoint):
    xyz = _xyz(b, n, seed=n)
    got = np.asarray(pk.fps_pallas(xyz, npoint, interpret=True))
    want = np.asarray(_fps_jax(xyz, npoint))
    np.testing.assert_array_equal(got, want)


def test_fps_pallas_custom_start():
    xyz = _xyz(2, 200, seed=7)
    st = jnp.array([5, 100], jnp.int32)
    got = np.asarray(pk.fps_pallas(xyz, 32, start_idx=st, interpret=True))
    want = np.asarray(_fps_jax(xyz, 32, st))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("b,n,s,r,k", [(2, 256, 64, 0.5, 16),
                                       (3, 511, 100, 1.2, 32),
                                       (2, 1024, 512, 0.2, 32),
                                       (1, 128, 16, 0.1, 8)])
def test_ball_query_pallas_exact(b, n, s, r, k):
    xyz = _xyz(b, n, seed=n + 1)
    new = xyz[:, :s]
    got = np.asarray(pk.ball_query_pallas(r, k, xyz, new, interpret=True))
    want = np.asarray(_query_ball_jax(r, k, xyz, new))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("b,n,m", [(2, 128, 32), (3, 511, 100),
                                   (1, 1024, 256)])
def test_three_nn_pallas_exact(b, n, m):
    from mm3d_tpu.ops.geometry import _three_nn_jax
    rng = np.random.RandomState(n + m)
    dense = jnp.asarray(rng.randn(b, n, 3).astype(np.float32))
    sparse = jnp.asarray(rng.randn(b, m, 3).astype(np.float32))
    gd, gi = pk.three_nn_pallas(dense, sparse, interpret=True)
    wd, wi = _three_nn_jax(dense, sparse)
    np.testing.assert_array_equal(np.asarray(gi), np.asarray(wi))
    np.testing.assert_allclose(np.asarray(gd), np.asarray(wd),
                               rtol=1e-5, atol=1e-5)


def test_dispatch_pallas_mode_uses_kernels():
    xyz = _xyz(2, 128, seed=3)
    with dispatch.use_impl("pallas"):
        got = np.asarray(farthest_point_sample(xyz, 16))
    want = np.asarray(_fps_jax(xyz, 16))
    np.testing.assert_array_equal(got, want)


def test_three_interpolate_kernel_matches_jax():
    """Fused weighted-gather interpolation kernel (SURVEY.md:87)."""
    import jax
    import jax.numpy as jnp
    from mm3d_tpu.ops import geometry as G
    from mm3d_tpu.ops import pallas_kernels as pk
    r = np.random.RandomState(0)
    B, M, N, C = 2, 48, 100, 24   # unaligned sizes
    pts = jnp.asarray(r.randn(B, M, C).astype(np.float32))
    dense = jnp.asarray(r.randn(B, N, 3).astype(np.float32))
    sparse = jnp.asarray(r.randn(B, M, 3).astype(np.float32))
    d, idx = G.three_nn(dense, sparse)
    w = G.interpolation_weights(d)
    want = np.asarray(G._three_interpolate_jax(pts, idx, w))
    got = np.asarray(pk.three_interpolate_pallas_raw(pts, idx, w,
                                                     interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    # gradients flow through the custom VJP (d_points via scatter-add,
    # d_weight via gather-dot)
    def loss_k(p, w_):
        return jnp.sum(pk.three_interpolate_pallas(p, idx, w_) ** 2)

    def loss_j(p, w_):
        return jnp.sum(G._three_interpolate_jax(p, idx, w_) ** 2)

    gk = jax.grad(loss_k, argnums=(0, 1))(pts, w)
    gj = jax.grad(loss_j, argnums=(0, 1))(pts, w)
    for a, b in zip(gk, gj):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)

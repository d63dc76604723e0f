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

"""Rank-scan ball query (v2) == canonical semantics, bit-exact.

v2 replaces the K-step serial extract-min with one prefix scan + MXU
index extraction (VERDICT r1 item 2); it must reproduce the exact
first-K/tie/padding contract of geometry._query_ball_jax.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mm3d_tpu.ops import geometry as G
from mm3d_tpu.ops import pallas_kernels as pk


@pytest.mark.parametrize("B,N,S,K,radius", [
    (2, 96, 24, 16, 0.4),     # unaligned N
    (1, 128, 8, 8, 0.15),     # sparse, zero-hit rows likely
    (2, 160, 40, 48, 1.5),    # K > hits -> padding; K > 32
    (2, 256, 64, 32, 0.3),    # bench-like density
])
def test_ball_query_v2_exact(B, N, S, K, radius):
    r = np.random.RandomState(0)
    xyz = jnp.asarray(r.randn(B, N, 3).astype(np.float32) * 0.5)
    new = G.index_points(xyz, G.farthest_point_sample(xyz, S))
    want = np.asarray(G.query_ball_point(radius, K, xyz, new))
    got = np.asarray(pk.ball_query_v2_pallas(radius, K, xyz, new,
                                             interpret=True))
    np.testing.assert_array_equal(got, want)


def test_ball_query_v2_zero_hit_centroid():
    r = np.random.RandomState(1)
    xyz = jnp.asarray(r.randn(2, 96, 3).astype(np.float32) * 0.5)
    new = G.index_points(xyz, G.farthest_point_sample(xyz, 16))
    new = new.at[:, 2].set(100.0)
    want = np.asarray(G.query_ball_point(0.4, 8, xyz, new))
    got = np.asarray(pk.ball_query_v2_pallas(0.4, 8, xyz, new,
                                             interpret=True))
    np.testing.assert_array_equal(got, want)

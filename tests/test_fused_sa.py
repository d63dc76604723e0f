"""Fused SA kernel (ball query + gather + MLP + max in one Pallas call).

The fused kernel is the eval-path implementation of the north star's
"shared MLPs fused into the grouping gather" clause (BASELINE.json:5,
SURVEY.md:82,88).  It must match the unfused project_first composition —
the path the logits-parity suite already ties to the torch oracle.

Interpret mode on CPU here; scripts/run_tpu_checks.py re-checks compiled.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mm3d_tpu import ops
from _helpers import jit_init
from mm3d_tpu.ops import geometry as G
from mm3d_tpu.ops import pallas_kernels as pk


def _mk(seed, B, N, S, C1, C2, C3):
    r = np.random.RandomState(seed)
    xyz = jnp.asarray(r.randn(B, N, 3).astype(np.float32) * 0.5)
    fidx = G.farthest_point_sample(xyz, S)
    new_xyz = G.index_points(xyz, fidx)
    pre = jnp.asarray(r.randn(B, N, C1).astype(np.float32))
    cbias = jnp.asarray(r.randn(B, S, C1).astype(np.float32))
    w1 = jnp.asarray(r.randn(C1, C2).astype(np.float32) * 0.3)
    b1 = jnp.asarray(r.randn(C2).astype(np.float32))
    w2 = jnp.asarray(r.randn(C2, C3).astype(np.float32) * 0.3)
    b2 = jnp.asarray(r.randn(C3).astype(np.float32))
    return xyz, new_xyz, pre, cbias, w1, b1, w2, b2


def _ref(radius, K, xyz, new_xyz, pre, cbias, w1, b1, w2, b2):
    idx = G.query_ball_point(radius, K, xyz, new_xyz)
    g = G.index_points(pre, idx)
    h = jax.nn.relu(g + cbias[:, :, None, :])
    h = jax.nn.relu(h @ w1 + b1)
    h = jax.nn.relu(h @ w2 + b2)
    return jnp.max(h, axis=2)


@pytest.mark.parametrize("B,N,S,K,radius", [
    (2, 96, 24, 16, 0.4),     # N not a multiple of 128
    (1, 128, 8, 8, 0.15),     # small radius -> sparse/zero-hit rows
    (2, 160, 40, 48, 1.5),    # nsample > typical hit count AND > padding
])
def test_fused_sa_matches_unfused(B, N, S, K, radius):
    args = _mk(0, B, N, S, 24, 16, 40)
    want = _ref(radius, K, *args)
    got = pk.fused_sa_pallas(radius, K, *args, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_fused_sa_zero_hit_centroid():
    xyz, new_xyz, pre, cbias, w1, b1, w2, b2 = _mk(1, 2, 96, 16, 12, 16, 24)
    new_xyz = new_xyz.at[:, 0].set(100.0)  # no points within radius
    want = _ref(0.4, 8, xyz, new_xyz, pre, cbias, w1, b1, w2, b2)
    got = pk.fused_sa_pallas(0.4, 8, xyz, new_xyz, pre, cbias, w1, b1, w2,
                             b2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_fused_sa_bf16_close():
    args = _mk(2, 2, 128, 32, 24, 24, 32)
    want = np.asarray(_ref(0.4, 16, *args), np.float32)
    bf = [a.astype(jnp.bfloat16) if a.dtype == jnp.float32 and a is not args[0]
          and a is not args[1] else a for a in args]
    got = np.asarray(pk.fused_sa_pallas(0.4, 16, *bf, interpret=True),
                     np.float32)
    assert np.max(np.abs(got - want) / (np.abs(want) + 1)) < 0.05


def test_sa_module_fused_path_matches_jax():
    """SetAbstraction eval with the fused kernel == pure-JAX path,
    including the BN fold (running stats made nontrivial first)."""
    from mm3d_tpu.models.pointnet2 import SetAbstraction

    r = np.random.RandomState(3)
    xyz = jnp.asarray(r.randn(2, 128, 3).astype(np.float32) * 0.5)
    feats = jnp.asarray(r.randn(2, 128, 5).astype(np.float32))
    sa = SetAbstraction(32, 0.4, 16, (24, 24, 48))
    v = jit_init(sa, jax.random.PRNGKey(0), xyz, feats, train=True)
    _, mut = jax.jit(lambda v, a, b: sa.apply(
        v, a, b, train=True, mutable=["batch_stats"]))(v, xyz, feats)
    v = {**v, "batch_stats": mut["batch_stats"]}
    # separate jit fns per impl: use_impl is read at trace time, so a
    # shared fn would silently replay the first path's trace
    ev_jax = jax.jit(lambda v, a, b: sa.apply(v, a, b, train=False))
    ev_pal = jax.jit(lambda v, a, b: sa.apply(v, a, b, train=False))
    with ops.use_impl("jax"):
        nx1, f1 = ev_jax(v, xyz, feats)
    with ops.use_impl("pallas"):
        nx2, f2 = ev_pal(v, xyz, feats)
    assert np.array_equal(np.asarray(nx1), np.asarray(nx2))
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2),
                               rtol=1e-5, atol=1e-5)


def test_msg_module_fused_path_matches_jax():
    from mm3d_tpu.models.pointnet2 import SetAbstractionMsg

    r = np.random.RandomState(4)
    xyz = jnp.asarray(r.randn(2, 128, 3).astype(np.float32) * 0.5)
    feats = jnp.asarray(r.randn(2, 128, 5).astype(np.float32))
    msg = SetAbstractionMsg(32, (0.2, 0.4), (8, 16),
                            ((16, 16, 32), (16, 24, 32)))
    v = jit_init(msg, jax.random.PRNGKey(0), xyz, feats, train=True)
    _, mut = jax.jit(lambda v, a, b: msg.apply(
        v, a, b, train=True, mutable=["batch_stats"]))(v, xyz, feats)
    v = {**v, "batch_stats": mut["batch_stats"]}
    ev_jax = jax.jit(lambda v, a, b: msg.apply(v, a, b, train=False))
    ev_pal = jax.jit(lambda v, a, b: msg.apply(v, a, b, train=False))
    with ops.use_impl("jax"):
        _, g1 = ev_jax(v, xyz, feats)
    with ops.use_impl("pallas"):
        _, g2 = ev_pal(v, xyz, feats)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-5, atol=1e-5)


def test_fused_sa_tri_path_np1024():
    """Np=1024 routes to the MXU triangular rank matmul and the v6
    kernel (the serving default at SA1); the other suite shapes are
    all < 1024 and route to v4, so without this the default serving
    kernel would never execute in the suite."""
    args = _mk(7, 1, 1024, 32, 16, 16, 32)
    rad, K = 0.25, 16
    want = np.asarray(_ref(rad, K, *args))
    got_def = np.asarray(pk.fused_sa_pallas(rad, K, *args, interpret=True))
    got_v2 = np.asarray(pk.fused_sa_pallas(rad, K, *args, interpret=True,
                                           version=2))
    np.testing.assert_allclose(got_def, want, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(got_def, got_v2)  # v6 ≡ v2 bitwise


def test_fused_sa_v4_block_packed_path():
    """N=512 / C1=32 activates v4's P=4 block packing (the semseg SA1
    serving default) — packed RHS layout, bstar block selection and the
    packed zero-hit clamp get no coverage from the other shapes (all
    resolve to P=1)."""
    r = np.random.RandomState(9)
    B, N, S, K, rad = 1, 512, 24, 16, 0.3
    C1, C2, C3 = 32, 16, 32
    xyz = jnp.asarray(r.randn(B, N, 3).astype(np.float32) * 0.5)
    fidx = G.farthest_point_sample(xyz, S)
    new_xyz = G.index_points(xyz, fidx)
    new_xyz = new_xyz.at[:, 3].set(50.0)  # force a zero-hit centroid
    pre = jnp.asarray(r.randn(B, N, C1).astype(np.float32))
    cbias = jnp.asarray(r.randn(B, S, C1).astype(np.float32))
    w1 = jnp.asarray(r.randn(C1, C2).astype(np.float32) * 0.3)
    b1 = jnp.asarray(r.randn(C2).astype(np.float32))
    w2 = jnp.asarray(r.randn(C2, C3).astype(np.float32) * 0.3)
    b2 = jnp.asarray(r.randn(C3).astype(np.float32))
    args = (xyz, new_xyz, pre, cbias, w1, b1, w2, b2)
    want = np.asarray(_ref(rad, K, *args))
    got4 = np.asarray(pk.fused_sa_pallas(rad, K, *args, interpret=True,
                                         version=4))
    np.testing.assert_allclose(got4, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("B,N,S,K,radius,C1", [
    (1, 1024, 32, 16, 0.25, 16),   # tri rank path + multi-group select
    (1, 512, 24, 16, 0.3, 32),     # scan rank path, Gn=4
    (2, 96, 24, 16, 0.4, 24),      # padded N, Gn=1 degenerate
])
def test_fused_sa_v7_slab_select(B, N, S, K, radius, C1):
    """v7 (slab-select gather — picks the target 128-lane group from
    per-group prefix counts, then compares only that slab) must match
    the unfused composition at every routing shape: tri/scan rank,
    group-packed RHS block selection, padding."""
    args = _mk(21, B, N, S, C1, 16, 32)
    want = np.asarray(_ref(radius, K, *args))
    got = np.asarray(pk.fused_sa_pallas(radius, K, *args, interpret=True,
                                        version=7))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_fused_sa_v7_zero_hit_and_overflow():
    xyz, new_xyz, pre, cbias, w1, b1, w2, b2 = _mk(22, 2, 256, 16, 12, 16, 24)
    new_xyz = new_xyz.at[:, 0].set(100.0)  # zero-hit centroid
    want = np.asarray(_ref(0.4, 48, xyz, new_xyz, pre, cbias, w1, b1, w2, b2))
    got = np.asarray(pk.fused_sa_pallas(
        0.4, 48, xyz, new_xyz, pre, cbias, w1, b1, w2, b2,
        interpret=True, version=7))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def _ref_knn(K, xyz, new_xyz, pre, cbias, w1, b1, w2, b2):
    idx = G.knn_point(K, xyz, new_xyz)
    g = G.index_points(pre, idx)
    h = jax.nn.relu(g + cbias[:, :, None, :])
    h = jax.nn.relu(h @ w1 + b1)
    h = jax.nn.relu(h @ w2 + b2)
    return jnp.max(h, axis=2)


@pytest.mark.parametrize("B,N,S,K", [
    (2, 96, 24, 16),    # N not a multiple of 128
    (1, 1024, 32, 32),  # SA1-like shape
    (2, 160, 40, 48),   # K not a power of two, padded N
])
def test_fused_sa_idx_matches_unfused_knn(B, N, S, K):
    """Given-idx fused tail (kNN serving, VERDICT r4 missing 4): XLA
    top-K indices + one fused gather/MLP/max kernel must match the
    unfused knn composition."""
    xyz, new_xyz, pre, cbias, w1, b1, w2, b2 = _mk(31, B, N, S, 24, 16, 40)
    want = _ref_knn(K, xyz, new_xyz, pre, cbias, w1, b1, w2, b2)
    idx = G.knn_point(K, xyz, new_xyz)
    got = pk.fused_sa_idx_pallas(K, idx, pre, cbias, w1, b1, w2, b2,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_fused_sa_idx_bf16_close():
    xyz, new_xyz, pre, cbias, w1, b1, w2, b2 = _mk(32, 2, 128, 32, 24, 24, 32)
    want = np.asarray(_ref_knn(16, xyz, new_xyz, pre, cbias, w1, b1, w2, b2),
                      np.float32)
    idx = G.knn_point(16, xyz, new_xyz)
    bf = [a.astype(jnp.bfloat16) for a in (pre, cbias, w1, b1, w2, b2)]
    got = np.asarray(pk.fused_sa_idx_pallas(16, idx, *bf, interpret=True),
                     np.float32)
    assert np.max(np.abs(got - want) / (np.abs(want) + 1)) < 0.05


def test_sa_module_knn_fused_path_matches_jax():
    """SetAbstraction(knn=True) eval under 'pallas' routes through the
    given-idx fused kernel and matches the pure-JAX path incl. BN fold."""
    from mm3d_tpu.models.pointnet2 import SetAbstraction

    r = np.random.RandomState(33)
    xyz = jnp.asarray(r.randn(2, 128, 3).astype(np.float32) * 0.5)
    feats = jnp.asarray(r.randn(2, 128, 5).astype(np.float32))
    sa = SetAbstraction(32, 0.4, 16, (24, 24, 48), knn=True)
    v = jit_init(sa, jax.random.PRNGKey(0), xyz, feats, train=True)
    _, mut = jax.jit(lambda v, a, b: sa.apply(
        v, a, b, train=True, mutable=["batch_stats"]))(v, xyz, feats)
    v = {**v, "batch_stats": mut["batch_stats"]}
    # separate jit fns per impl: use_impl is read at trace time, so a
    # shared fn would silently replay the first path's trace
    ev_jax = jax.jit(lambda v, a, b: sa.apply(v, a, b, train=False))
    ev_pal = jax.jit(lambda v, a, b: sa.apply(v, a, b, train=False))
    with ops.use_impl("jax"):
        nx1, f1 = ev_jax(v, xyz, feats)
    with ops.use_impl("pallas"):
        nx2, f2 = ev_pal(v, xyz, feats)
    assert np.array_equal(np.asarray(nx1), np.asarray(nx2))
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2),
                               rtol=1e-5, atol=1e-5)


def test_fused_sa_idx_auto_routing_gate():
    """Auto-mode routing for the given-idx fused tail follows the r5
    on-chip race: bf16 serving takes it only at N/K <= 16; explicit
    'pallas' mode always routes; fp32-auto and train never do."""
    from mm3d_tpu.models.pointnet2 import _want_fused_sa_idx

    mlp = (64, 64, 128)
    with ops.use_impl("auto"):
        # bf16 serving: SA2-like (N/K=8) wins its race -> routed
        assert _want_fused_sa_idx(False, mlp, jnp.bfloat16, True, 64, 512)
        # SA1-like (N/K=32) lost in both dtypes -> unfused
        assert not _want_fused_sa_idx(False, mlp, jnp.bfloat16, True, 32, 1024)
        # boundary: exactly N/K == 16 still routes
        assert _want_fused_sa_idx(False, mlp, jnp.bfloat16, True, 32, 512)
        # fp32-auto never routes (loses at every raced shape)
        assert not _want_fused_sa_idx(False, mlp, None, True, 64, 512)
        # train mode / non-kNN / K > 128 never route
        assert not _want_fused_sa_idx(True, mlp, jnp.bfloat16, True, 64, 512)
        assert not _want_fused_sa_idx(False, mlp, jnp.bfloat16, False, 64, 512)
        assert not _want_fused_sa_idx(False, mlp, jnp.bfloat16, True, 192, 512)
    with ops.use_impl("pallas"):
        # explicit pallas: every eligible shape routes (tests/sweeps)
        assert _want_fused_sa_idx(False, mlp, None, True, 32, 1024)
    with ops.use_impl("jax"):
        # the caller's kernel_or_none() returns None in jax mode; the
        # predicate itself still reflects the bf16 shape gate
        assert ops.dispatch.kernel_or_none("fused_sa_idx") is None


def test_fused_sa_large_nsample_routes_exact():
    """nsample > 128 must not route to v4 (its bf16 arithmetic one-hot
    is exact only for clamped slot ranks <= 128)."""
    r = np.random.RandomState(11)
    B, N, S, K, rad = 1, 256, 8, 192, 2.5  # dense: many ranks > 128
    C1, C2, C3 = 16, 16, 16
    xyz = jnp.asarray(r.randn(B, N, 3).astype(np.float32) * 0.5)
    new_xyz = xyz[:, :S]
    pre = jnp.asarray(r.randn(B, N, C1).astype(np.float32))
    cbias = jnp.asarray(r.randn(B, S, C1).astype(np.float32))
    w1 = jnp.asarray(r.randn(C1, C2).astype(np.float32) * 0.3)
    b1 = jnp.asarray(r.randn(C2).astype(np.float32))
    w2 = jnp.asarray(r.randn(C2, C3).astype(np.float32) * 0.3)
    b2 = jnp.asarray(r.randn(C3).astype(np.float32))
    args = (xyz, new_xyz, pre, cbias, w1, b1, w2, b2)
    want = np.asarray(_ref(rad, K, *args))
    got = np.asarray(pk.fused_sa_pallas(rad, K, *args, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

"""Backward of the grouping gather (index_points custom VJP).

The training bottleneck is the scatter-add transpose of the neighbor
gather (SURVEY.md §7 hard part (c), VERDICT r1 item 3).  On TPU it runs
as a Pallas one-hot-transpose matmul; these tests pin both the kernel
(interpret mode) and the custom_vjp plumbing against explicit
scatter-add / plain autodiff.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mm3d_tpu import ops
from mm3d_tpu.ops import geometry as G
from mm3d_tpu.ops import pallas_kernels as pk


def _scatter_ref(g, idx, n):
    B, C = g.shape[0], g.shape[-1]
    flat = np.zeros((B * n, C), np.float32)
    offs = (np.arange(B) * n).reshape((B,) + (1,) * (idx.ndim - 1))
    np.add.at(flat, np.asarray(idx + offs).reshape(-1),
              np.asarray(g, np.float32).reshape(-1, C))
    return flat.reshape(B, n, C)


@pytest.mark.parametrize("B,n,F,C", [
    (2, 100, (30, 4), 24),    # n not 8-aligned, C not 128-aligned, dup idx
    (1, 256, (512,), 3),      # xyz-style gather, many duplicates
])
def test_gather_bwd_kernel_matches_scatter(B, n, F, C):
    r = np.random.RandomState(0)
    g = jnp.asarray(r.randn(B, *F, C).astype(np.float32))
    idx = jnp.asarray(r.randint(0, n, (B, *F)).astype(np.int32))
    got = np.asarray(pk.gather_bwd_pallas(g, idx, n, interpret=True))
    want = _scatter_ref(g, idx, n)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_index_points_grad_matches_plain_autodiff():
    r = np.random.RandomState(1)
    pts = jnp.asarray(r.randn(2, 64, 8).astype(np.float32))
    idx = jnp.asarray(r.randint(0, 64, (2, 16, 4)).astype(np.int32))
    co = jnp.asarray(r.randn(2, 16, 4, 8).astype(np.float32))

    def loss_cv(p):
        return jnp.sum(G.index_points(p, idx) * co)

    def loss_plain(p):
        return jnp.sum(G._index_points_impl(p, idx) * co)

    g_cv = jax.grad(loss_cv)(pts)
    g_plain = jax.grad(loss_plain)(pts)
    np.testing.assert_allclose(np.asarray(g_cv), np.asarray(g_plain),
                               rtol=1e-5, atol=1e-5)
    # and through the Pallas kernel (interpret mode)
    with ops.use_impl("pallas"):
        g_pk = jax.grad(loss_cv)(pts)
    np.testing.assert_allclose(np.asarray(g_pk), np.asarray(g_plain),
                               rtol=1e-5, atol=1e-5)


def test_index_points_grad_under_jit_and_vmap():
    r = np.random.RandomState(2)
    pts = jnp.asarray(r.randn(2, 32, 4).astype(np.float32))
    idx = jnp.asarray(r.randint(0, 32, (2, 8)).astype(np.int32))

    @jax.jit
    def g(p):
        return jax.grad(lambda q: jnp.sum(G.index_points(q, idx) ** 2))(p)

    # grad of sum(out^2) == scatter-add of 2*out
    np.testing.assert_allclose(np.asarray(g(pts)), 2 * _scatter_ref(
        np.asarray(G.index_points(pts, idx)), idx, 32), rtol=1e-5,
        atol=1e-5)

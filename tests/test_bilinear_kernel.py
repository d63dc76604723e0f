"""Fused bilinear-sampling Pallas kernel vs the pure-JAX reference.

The kernel collapses the 4-corner gather + lerp into one sparse-row MXU
matmul (BASELINE.json:5, SURVEY.md:89).  The JAX reference is itself
pinned to torch grid_sample in tests/test_fusion.py, so kernel == JAX
closes the parity chain.  Interpret mode on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mm3d_tpu import ops
from mm3d_tpu.ops import pallas_kernels as pk
from mm3d_tpu.ops import projection as proj


def _mk(seed, B, H, W, C, N, spread=1.4):
    r = np.random.RandomState(seed)
    feat = jnp.asarray(r.randn(B, H, W, C).astype(np.float32))
    # spread > 1 puts a fraction of points outside the frame
    uv = jnp.asarray(
        (r.rand(B, N, 2) * spread - 0.2 * (spread - 1))
        .astype(np.float32) * np.array([W - 1, H - 1], np.float32))
    return feat, uv


@pytest.mark.parametrize("B,H,W,C,N", [
    (2, 16, 16, 24, 100),   # C not lane-aligned, N not sublane-aligned
    (1, 8, 12, 128, 64),    # non-square, aligned C
])
def test_bilinear_kernel_matches_jax(B, H, W, C, N):
    feat, uv = _mk(0, B, H, W, C, N)
    want = np.asarray(proj._bilinear_sample_jax(feat, uv))
    got = np.asarray(pk.bilinear_sample_pallas_raw(feat, uv,
                                                   interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_bilinear_kernel_out_of_frame_zero():
    feat, _ = _mk(1, 1, 8, 8, 16, 4)
    uv = jnp.asarray(np.array(
        [[[-5.0, 3.0], [3.0, -5.0], [20.0, 3.0], [3.5, 3.5]]], np.float32))
    got = np.asarray(pk.bilinear_sample_pallas_raw(feat, uv,
                                                   interpret=True))
    assert np.all(got[0, :3] == 0.0)
    want = np.asarray(proj._bilinear_sample_jax(feat, uv))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_bilinear_custom_vjp_grads_match_jax():
    feat, uv = _mk(2, 1, 8, 8, 8, 32)

    def loss_k(f, u):
        return jnp.sum(pk.bilinear_sample_pallas(f, u) ** 2)

    def loss_j(f, u):
        return jnp.sum(proj._bilinear_sample_jax(f, u) ** 2)

    gf_k, gu_k = jax.grad(loss_k, argnums=(0, 1))(feat, uv)
    gf_j, gu_j = jax.grad(loss_j, argnums=(0, 1))(feat, uv)
    np.testing.assert_allclose(np.asarray(gf_k), np.asarray(gf_j),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gu_k), np.asarray(gu_j),
                               rtol=1e-4, atol=1e-5)


def test_bilinear_custom_vjp_bf16_cotangent():
    # bf16 feat: the Pallas forward returns bf16 while the JAX twin the
    # backward differentiates promotes to f32 (f32 corner weights) — the
    # bwd must align the bf16 cotangent or the inner vjp rejects it
    # (crashed fusion_semseg bf16 training on chip, round 5)
    feat, uv = _mk(4, 1, 8, 8, 8, 32)
    fb = feat.astype(jnp.bfloat16)

    def loss_k(f, u):
        return jnp.sum(pk.bilinear_sample_pallas(f, u).astype(jnp.float32)
                       ** 2)

    gf, gu = jax.grad(loss_k, argnums=(0, 1))(fb, uv)
    assert gf.dtype == jnp.bfloat16 and gf.shape == fb.shape
    gf_j = jax.grad(
        lambda f, u: jnp.sum(proj._bilinear_sample_jax(f, u) ** 2),
        argnums=0)(feat, uv)
    np.testing.assert_allclose(np.asarray(gf, np.float32),
                               np.asarray(gf_j), rtol=0.1, atol=0.1)


def test_three_interpolate_custom_vjp_bf16_cotangent():
    # same dtype-promotion hazard as the bilinear kernel: bf16 points,
    # f32 interpolation weights promote the twin's output to f32
    from mm3d_tpu.ops import geometry as G
    r = np.random.RandomState(5)
    pts = jnp.asarray(r.randn(2, 16, 8).astype(np.float32))
    idx = jnp.asarray(r.randint(0, 16, (2, 24, 3)).astype(np.int32))
    w = r.rand(2, 24, 3).astype(np.float32)
    w = jnp.asarray(w / w.sum(-1, keepdims=True))

    def loss(p):
        return jnp.sum(
            pk.three_interpolate_pallas(p, idx, w).astype(jnp.float32) ** 2)

    gp = jax.grad(loss)(pts.astype(jnp.bfloat16))
    assert gp.dtype == jnp.bfloat16 and gp.shape == pts.shape
    gp_j = jax.grad(
        lambda p: jnp.sum(G._three_interpolate_jax(p, idx, w) ** 2))(pts)
    np.testing.assert_allclose(np.asarray(gp, np.float32),
                               np.asarray(gp_j), rtol=0.1, atol=0.1)


def test_bilinear_dispatch_pallas_mode():
    feat, uv = _mk(3, 2, 8, 8, 16, 24)
    with ops.use_impl("jax"):
        want = proj.bilinear_sample(feat, uv)
    with ops.use_impl("pallas"):
        got = proj.bilinear_sample(feat, uv)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

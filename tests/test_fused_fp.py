"""Fused FP-tail kernel parity (interpret mode): three_nn + inverse-
distance interp + skip + relu in one Pallas call must match the op
composition exactly (same extract-min order, same eps).  VERDICT r2
item 9 — the race itself runs on chip (scripts/proto_fp_fused.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mm3d_tpu import ops
from mm3d_tpu.ops import pallas_kernels as pk


def _composition(xyz1, xyz2, pre, skip):
    d, idx = ops.three_nn(xyz1, xyz2)
    w = ops.geometry.interpolation_weights(d)
    interp = ops.three_interpolate(pre, idx, w.astype(pre.dtype))
    return jax.nn.relu(interp + skip.astype(interp.dtype))


@pytest.mark.parametrize("N,M,C1", [(256, 64, 128), (130, 96, 32)])
def test_fused_fp_matches_composition(N, M, C1):
    r = np.random.RandomState(0)
    B = 2
    xyz1 = jnp.asarray(r.randn(B, N, 3).astype(np.float32))
    xyz2 = jnp.asarray(r.randn(B, M, 3).astype(np.float32))
    pre = jnp.asarray(r.randn(B, M, C1).astype(np.float32))
    skip = jnp.asarray(r.randn(B, N, C1).astype(np.float32))
    ref = np.asarray(_composition(xyz1, xyz2, pre, skip))
    out = np.asarray(pk.fused_fp_pallas(xyz1, xyz2, pre, skip,
                                        interpret=True))
    scale = max(np.abs(ref).max(), 1e-9)
    assert np.abs(out - ref).max() / scale < 1e-6, \
        np.abs(out - ref).max() / scale


def test_fused_fp_duplicate_points():
    # ties: duplicated sparse points must pick the first occurrence,
    # exactly like lax.top_k in the composition
    r = np.random.RandomState(1)
    B, N, M, C1 = 1, 64, 32, 64
    xyz2 = np.asarray(r.randn(B, M, 3), np.float32)
    xyz2[0, 10] = xyz2[0, 3]  # duplicate
    xyz1 = np.asarray(r.randn(B, N, 3), np.float32)
    xyz1[0, 0] = xyz2[0, 3]  # dense point exactly on a duplicated source
    pre = jnp.asarray(r.randn(B, M, C1).astype(np.float32))
    skip = jnp.zeros((B, N, C1), jnp.float32)
    xyz1 = jnp.asarray(xyz1)
    xyz2 = jnp.asarray(xyz2)
    ref = np.asarray(_composition(xyz1, xyz2, pre, skip))
    out = np.asarray(pk.fused_fp_pallas(xyz1, xyz2, pre, skip,
                                        interpret=True))
    scale = max(np.abs(ref).max(), 1e-9)
    assert np.abs(out - ref).max() / scale < 1e-6


def test_fused_fp_bf16():
    r = np.random.RandomState(2)
    B, N, M, C1 = 2, 128, 64, 64
    xyz1 = jnp.asarray(r.randn(B, N, 3).astype(np.float32))
    xyz2 = jnp.asarray(r.randn(B, M, 3).astype(np.float32))
    pre = jnp.asarray(r.randn(B, M, C1).astype(np.float32)).astype(
        jnp.bfloat16)
    skip = jnp.asarray(r.randn(B, N, C1).astype(np.float32)).astype(
        jnp.bfloat16)
    ref = np.asarray(_composition(xyz1, xyz2, pre, skip), np.float32)
    out = np.asarray(pk.fused_fp_pallas(xyz1, xyz2, pre, skip,
                                        interpret=True), np.float32)
    scale = max(np.abs(ref).max(), 1e-9)
    assert np.abs(out - ref).max() / scale < 2e-2  # bf16 interp tolerance


def test_semseg_model_pallas_fp_parity():
    # whole-model eval parity: forcing impl 'pallas' activates the fused
    # FP tail (and fused SA) — logits must match the pure-JAX path
    from mm3d_tpu.models import get_model
    from mm3d_tpu.ops import dispatch

    spec = get_model("pointnet2_sem_seg")
    model = spec.builder(num_class=13)
    r = np.random.RandomState(3)
    pts = jnp.asarray(r.randn(1, 512, 9).astype(np.float32))
    from _helpers import jit_init
    variables = jit_init(model, {"params": jax.random.PRNGKey(0),
                                 "dropout": jax.random.PRNGKey(1)},
                         pts, train=True)
    with dispatch.use_impl("jax"):
        ref, _ = jax.jit(lambda v: model.apply(v, pts, train=False))(variables)
    with dispatch.use_impl("pallas"):
        out, _ = jax.jit(lambda v: model.apply(v, pts, train=False))(variables)
    ref = np.asarray(ref)
    out = np.asarray(out)
    assert np.abs(out - ref).max() < 1e-4, np.abs(out - ref).max()

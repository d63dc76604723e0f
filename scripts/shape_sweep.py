#!/usr/bin/env python
"""Real-TPU shape sweep: compile + exactness of the ball-query and
fused-SA kernels at every (N, S, K) the registered model configs use.

This is the net that caught the Np=2048 tiling bug (negative VMEM
budget after the tri operand drove 1-sublane tiles, which Mosaic
rejects — any semseg/partseg model at canonical npoint failed to
compile).  Run after touching kernel tile planning:
    python scripts/shape_sweep.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mm3d_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from mm3d_tpu.ops import geometry as G
from mm3d_tpu.ops import pallas_kernels as pk

# every (N, S, K) combination the registered configs use
# (cls/partseg/semseg/fusion families, SSG + MSG branches)
SHAPES = [(1024, 512, 32), (512, 128, 64), (1024, 512, 16),
          (1024, 512, 128), (2048, 512, 32), (2048, 512, 64),
          (2048, 512, 128), (512, 128, 32), (4096, 1024, 32),
          (1024, 256, 32), (256, 64, 32), (64, 16, 32),
          (4096, 1024, 16), (1024, 256, 16)]


def main():
    r = np.random.RandomState(0)
    bad = []
    for (N, S, K) in SHAPES:
        xyz = jnp.asarray(r.randn(2, N, 3).astype(np.float32) * 0.5)
        new = G.index_points(
            xyz, jax.jit(lambda p, S=S: pk.fps_pallas(p, S))(xyz))
        rad = 0.2
        try:
            w = np.asarray(jax.jit(
                lambda a, b, K=K: G._query_ball_jax(rad, K, a, b))(xyz, new))
            g = np.asarray(jax.jit(
                lambda a, b, K=K: pk.ball_query_v2_pallas(rad, K, a, b))(
                    xyz, new))
            ok_bq = bool((w == g).all())
            C1, C2, C3 = 64, 64, 128
            pre = jnp.asarray(r.randn(2, N, C1).astype(np.float32)
                              ).astype(jnp.bfloat16)
            cb = jnp.asarray(r.randn(2, S, C1).astype(np.float32)
                             ).astype(jnp.bfloat16)
            w1 = jnp.asarray(r.randn(C1, C2).astype(np.float32) * .2
                             ).astype(jnp.bfloat16)
            b1 = jnp.zeros(C2, jnp.bfloat16)
            w2 = jnp.asarray(r.randn(C2, C3).astype(np.float32) * .2
                             ).astype(jnp.bfloat16)
            b2 = jnp.zeros(C3, jnp.bfloat16)
            out = jax.jit(lambda p, K=K: pk.fused_sa_pallas(
                rad, K, xyz, new, p, cb, w1, b1, w2, b2))(pre)
            ok_sa = bool(jnp.isfinite(out.astype(jnp.float32)).all())
            # v7 (slab-select): every one-hot row has exactly one
            # nonzero term, so it must match the default bit-for-bit
            out7 = jax.jit(lambda p, K=K: pk.fused_sa_pallas(
                rad, K, xyz, new, p, cb, w1, b1, w2, b2, version=7))(pre)
            ok_v7 = bool((np.asarray(out7) == np.asarray(out)).all())
            print(f"N={N} S={S} K={K}: bq_exact={ok_bq} "
                  f"fused_finite={ok_sa} v7_exact={ok_v7}", flush=True)
            if not (ok_bq and ok_sa and ok_v7):
                bad.append((N, S, K))
        except Exception as e:  # noqa: BLE001 — report and continue
            print(f"N={N} S={S} K={K}: FAILED {type(e).__name__}: "
                  f"{str(e)[:140]}", flush=True)
            bad.append((N, S, K))
    # fused FP-tail kernel at every (N_dense, M_sparse, C1) the
    # registered FP blocks use (semseg/partseg/fusion; fp1-fp4)
    FP_SHAPES = [(4096, 1024, 128), (2048, 512, 128), (1024, 256, 256),
                 (256, 64, 256), (1024, 512, 128), (512, 128, 256),
                 (256, 16, 256), (2048, 512, 256), (128, 32, 256)]
    for (N, M, C1) in FP_SHAPES:
        x1 = jnp.asarray(r.randn(2, N, 3).astype(np.float32))
        x2 = x1[:, :M]
        pre = jnp.asarray(r.randn(2, M, C1).astype(np.float32))
        skip = jnp.asarray(r.randn(2, N, C1).astype(np.float32))
        try:
            def comp(p):
                d, i3 = pk.three_nn_pallas(x1, x2)
                wgt = G.interpolation_weights(d)
                import mm3d_tpu.ops as O
                return jax.nn.relu(O.three_interpolate(p, i3, wgt) + skip)
            want = np.asarray(jax.jit(comp)(pre))
            got = np.asarray(jax.jit(
                lambda p: pk.fused_fp_pallas(x1, x2, p, skip))(pre))
            ok = bool(np.allclose(got, want, rtol=1e-5, atol=1e-4))
            print(f"FP N={N} M={M} C1={C1}: fused_fp_match={ok}",
                  flush=True)
            if not ok:
                bad.append(("fp", N, M, C1))
        except Exception as e:  # noqa: BLE001
            print(f"FP N={N} M={M} C1={C1}: FAILED "
                  f"{type(e).__name__}: {str(e)[:140]}", flush=True)
            bad.append(("fp", N, M, C1))
    # given-idx fused SA tail (kNN serving, r5) at the knn model's SA
    # shapes: fp32 parity vs the unfused composition + bf16 compile/
    # finiteness (the VMEM tile accounting is dtype-dependent)
    IDX_SHAPES = [(1024, 512, 32, 64, 64, 128),
                  (512, 128, 64, 128, 128, 256)]
    for (N, S, K, C1, C2, C3) in IDX_SHAPES:
        xyz = jnp.asarray(r.randn(2, N, 3).astype(np.float32) * 0.5)
        new = G.index_points(
            xyz, jax.jit(lambda p, S=S: pk.fps_pallas(p, S))(xyz))
        idx = jax.jit(lambda a, b, K=K: G.knn_point(K, a, b))(xyz, new)
        pre = jnp.asarray(r.randn(2, N, C1).astype(np.float32))
        cb = jnp.asarray(r.randn(2, S, C1).astype(np.float32))
        w1 = jnp.asarray(r.randn(C1, C2).astype(np.float32) * .2)
        b1 = jnp.zeros(C2, jnp.float32)
        w2 = jnp.asarray(r.randn(C2, C3).astype(np.float32) * .2)
        b2 = jnp.zeros(C3, jnp.float32)
        try:
            def comp(p):
                g = G.index_points(p, idx)
                h = jax.nn.relu(g + cb[:, :, None, :])
                h = jax.nn.relu(h @ w1 + b1)
                h = jax.nn.relu(h @ w2 + b2)
                return jnp.max(h, axis=2)
            with jax.default_matmul_precision("highest"):
                want = np.asarray(jax.jit(comp)(pre))
            got = np.asarray(jax.jit(
                lambda p, K=K: pk.fused_sa_idx_pallas(
                    K, idx, p, cb, w1, b1, w2, b2))(pre))
            ok = bool(np.allclose(got, want, rtol=1e-5, atol=1e-4))
            outb = jax.jit(
                lambda p, K=K: pk.fused_sa_idx_pallas(
                    K, idx, p, cb.astype(jnp.bfloat16),
                    w1.astype(jnp.bfloat16), b1.astype(jnp.bfloat16),
                    w2.astype(jnp.bfloat16), b2.astype(jnp.bfloat16)))(
                        pre.astype(jnp.bfloat16))
            ok_b = bool(jnp.isfinite(outb.astype(jnp.float32)).all())
            print(f"IDX N={N} S={S} K={K} C={C1}/{C2}/{C3}: "
                  f"f32_match={ok} bf16_finite={ok_b}", flush=True)
            if not (ok and ok_b):
                bad.append(("idx", N, S, K))
        except Exception as e:  # noqa: BLE001
            print(f"IDX N={N} S={S} K={K}: FAILED "
                  f"{type(e).__name__}: {str(e)[:140]}", flush=True)
            bad.append(("idx", N, S, K))
    print("BAD:", bad if bad else "none — all shapes pass")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Race the v3 fused-SA kernel (k-major repeat one-hot, bf16 ranks,
post-gather zero-hit clamp) against the r2 kernel on the real chip, and
check exactness vs the unfused composition.

Run:  python scripts/proto_sa_v3.py            # bf16 serving shapes
      MM3D_PROTO_DTYPE=float32 python scripts/proto_sa_v3.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mm3d_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from mm3d_tpu import ops
from mm3d_tpu.ops import pallas_kernels as pk
from mm3d_tpu.utils.profiling import chain_time

DTYPE = (jnp.float32 if os.environ.get("MM3D_PROTO_DTYPE") == "float32"
         else jnp.bfloat16)
B = int(os.environ.get("MM3D_PROTO_BATCH", "64"))

SHAPES = [  # (name, N, S, K, radius, C1, C2, C3)
    ("SA1", 1024, 512, 32, 0.2, 64, 64, 128),
    ("SA2", 512, 128, 64, 0.4, 128, 128, 256),
    ("semseg-sa1", 4096, 1024, 32, 0.1, 32, 32, 64),
]


def unfused_ref(radius, K, xyz, new_xyz, pre, cbias, w1, b1, w2, b2):
    idx = ops.query_ball_point(radius, K, xyz, new_xyz)
    g = ops.index_points(pre, idx)
    h = jax.nn.relu(g + cbias[:, :, None, :])
    h = jax.nn.relu(h @ w1 + b1)
    h = jax.nn.relu(h @ w2 + b2)
    return jnp.max(h, axis=2)


def main():
    r = np.random.RandomState(0)
    for name, N, S, K, radius, C1, C2, C3 in SHAPES:
        xyz = jnp.asarray(r.randn(B, N, 3).astype(np.float32))
        fidx = ops.farthest_point_sample(xyz, S)
        new_xyz = ops.index_points(xyz, fidx)
        pre = jnp.asarray(r.randn(B, N, C1).astype(np.float32)).astype(DTYPE)
        cb = jnp.asarray(
            (r.randn(B, S, C1) * 0.1).astype(np.float32)).astype(DTYPE)
        w1 = jnp.asarray((r.randn(C1, C2) * 0.1).astype(np.float32)).astype(DTYPE)
        b1 = jnp.asarray((r.randn(C2) * 0.1).astype(np.float32)).astype(DTYPE)
        w2 = jnp.asarray((r.randn(C2, C3) * 0.1).astype(np.float32)).astype(DTYPE)
        b2 = jnp.asarray((r.randn(C3) * 0.1).astype(np.float32)).astype(DTYPE)

        f2 = jax.jit(lambda p: pk.fused_sa_pallas(
            radius, K, xyz, new_xyz, p, cb, w1, b1, w2, b2, version=2))
        f4 = jax.jit(lambda p: pk.fused_sa_pallas(
            radius, K, xyz, new_xyz, p, cb, w1, b1, w2, b2, version=4))
        f6 = jax.jit(lambda p: pk.fused_sa_pallas(
            radius, K, xyz, new_xyz, p, cb, w1, b1, w2, b2, version=6))
        o2 = np.asarray(f2(pre), np.float32)
        o4 = np.asarray(f4(pre), np.float32)
        o6 = np.asarray(f6(pre), np.float32)
        oref = np.asarray(jax.jit(lambda p: unfused_ref(
            radius, K, xyz, new_xyz, p, cb, w1, b1, w2, b2))(pre), np.float32)
        scale = max(np.abs(oref).max(), 1e-9)
        print(f"{name}: |v4-v2|max={np.abs(o4 - o2).max():.3e} "
              f"|v6-v2|max={np.abs(o6 - o2).max():.3e} "
              f"|v4-ref|rel={np.abs(o4 - oref).max() / scale:.3e} "
              f"|v2-ref|rel={np.abs(o2 - oref).max() / scale:.3e}", flush=True)

        def chainable(fn):
            def f(p):
                o = fn(p)
                return p + (1e-6 * o.astype(jnp.float32).mean()).astype(DTYPE)
            return f

        t2 = chain_time(chainable(f2), pre, k1=5, k2=25, reps=3) * 1e3
        t4 = chain_time(chainable(f4), pre, k1=5, k2=25, reps=3) * 1e3
        t6 = chain_time(chainable(f6), pre, k1=5, k2=25, reps=3) * 1e3
        print(f"{name}: v2 {t2:.3f} v4 {t4:.3f} v6 {t6:.3f} ms"
              f"   v2/v6 {t2 / max(t6, 1e-9):.2f}x", flush=True)


if __name__ == "__main__":
    main()

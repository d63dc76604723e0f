#!/usr/bin/env python
"""Race the v7 fused-SA kernel (slab-select gather) against the r3
serving defaults (v6 at tri shapes, v4 elsewhere) on the real chip.

v7 is the VERDICT r3 item-2 attack on the one-hot build floor: instead
of 3 VPU passes over the [St*K, N] one-hot stack, it locates each
slot's target 128-lane group from per-group prefix counts ([R,1]
algebra), slab-selects that group's rank tile (~1 pass over [R, N]),
and compares only [R, 128]; the gather matmul runs against a
group-packed RHS at R*N*C1 MACs (v4's reduction).

Run:  python scripts/proto_sa_v7.py            # bf16 serving shapes
      MM3D_PROTO_DTYPE=float32 python scripts/proto_sa_v7.py
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

SHAPES = [  # (name, N, S, K, radius, C1, C2, C3, default_version)
    ("SA1", 1024, 512, 32, 0.2, 64, 64, 128, 6),
    ("SA2", 512, 128, 64, 0.4, 128, 128, 256, 4),
    ("semseg-sa1", 4096, 1024, 32, 0.1, 32, 32, 64, 4),
]


def main():
    r = np.random.RandomState(0)
    for name, N, S, K, radius, C1, C2, C3, defv in SHAPES:
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

        fdef = jax.jit(lambda p: pk.fused_sa_pallas(
            radius, K, xyz, new_xyz, p, cb, w1, b1, w2, b2, version=defv))
        f7 = jax.jit(lambda p: pk.fused_sa_pallas(
            radius, K, xyz, new_xyz, p, cb, w1, b1, w2, b2, version=7))
        odef = np.asarray(fdef(pre), np.float32)
        o7 = np.asarray(f7(pre), np.float32)
        print(f"{name}: |v7-v{defv}|max={np.abs(o7 - odef).max():.3e}",
              flush=True)

        def chainable(fn):
            def f(p):
                o = fn(p)
                return p + (1e-6 * o.astype(jnp.float32).mean()).astype(DTYPE)
            return f

        tdef = chain_time(chainable(fdef), pre, k1=5, k2=25, reps=3) * 1e3
        t7 = chain_time(chainable(f7), pre, k1=5, k2=25, reps=3) * 1e3
        print(f"{name}: v{defv} {tdef:.3f} v7 {t7:.3f} ms"
              f"   v{defv}/v7 {tdef / max(t7, 1e-9):.2f}x", flush=True)


if __name__ == "__main__":
    main()

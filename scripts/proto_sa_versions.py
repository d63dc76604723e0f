#!/usr/bin/env python
"""Race the live fused-SA variants (v2/v4/v6) at an arbitrary batch.

The v4/v6 serving defaults were raced at B=64 (BASELINE.md r3).  The
late-r5 batch sweep moved the north-star bench to B=128, which doubles
R = B*S in every kernel; tile choices and the one-hot-build/matmul
balance both depend on R, so the winner may flip.  Outputs are asserted
bit-identical before timing.

Run:  MM3D_PROTO_BATCH=128 python scripts/proto_sa_versions.py
      MM3D_PROTO_DTYPE=float32 ... for fp32
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
B = int(os.environ.get("MM3D_PROTO_BATCH", "128"))
VERSIONS = (2, 4, 6)

SHAPES = [  # (name, N, S, K, radius, C1, C2, C3)  — fusion_cls bench shapes
    ("SA1", 1024, 512, 32, 0.2, 64, 64, 128),
    ("SA2", 512, 128, 64, 0.4, 128, 128, 256),
]


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

        fns, outs = {}, {}
        for v in VERSIONS:
            fns[v] = jax.jit(lambda p, v=v: pk.fused_sa_pallas(
                radius, K, xyz, new_xyz, p, cb, w1, b1, w2, b2, version=v))
            outs[v] = np.asarray(fns[v](pre), np.float32)
        ref = outs[VERSIONS[0]]
        for v in VERSIONS[1:]:
            d = np.abs(outs[v] - ref).max()
            assert d == 0.0, f"{name}: v{v} differs from v{VERSIONS[0]} by {d}"
        print(f"{name}: all versions bit-identical", flush=True)

        def chainable(fn):
            def f(p):
                o = fn(p)
                return p + (1e-6 * o.astype(jnp.float32).mean()).astype(DTYPE)
            return f

        times = {v: chain_time(chainable(fns[v]), pre, k1=5, k2=25,
                               reps=3) * 1e3 for v in VERSIONS}
        best = min(times, key=times.get)
        print(f"{name} B={B} {DTYPE.__name__}: "
              + "  ".join(f"v{v} {times[v]:.3f}" for v in VERSIONS)
              + f" ms   -> v{best} wins", flush=True)


if __name__ == "__main__":
    main()

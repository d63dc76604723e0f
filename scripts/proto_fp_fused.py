#!/usr/bin/env python
"""Race the fused FP-tail kernel (three_nn + inverse-distance interp +
skip + relu in ONE Pallas call) against the op composition on the real
chip — VERDICT r2 item 9.

Run:  python scripts/proto_fp_fused.py
      MM3D_PROTO_DTYPE=float32 python scripts/proto_fp_fused.py
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

SHAPES = [  # (name, B, N_dense, M_sparse, C1)  — semseg/partseg FP shapes
    ("semseg-fp4", 8, 2048, 512, 128),
    ("semseg-fp4-4k", 8, 4096, 1024, 128),
    ("partseg-fp3", 16, 2048, 512, 128),
    ("fp-small", 8, 512, 128, 256),
]


def composition(xyz1, xyz2, pre, skip):
    d, idx = ops.three_nn(xyz1, xyz2)
    w = ops.geometry.interpolation_weights(d)
    interp = ops.three_interpolate(pre, idx, w.astype(pre.dtype))
    return jax.nn.relu(interp + skip)


def main():
    r = np.random.RandomState(0)
    for name, B, N, M, C1 in SHAPES:
        xyz1 = jnp.asarray(r.randn(B, N, 3).astype(np.float32))
        xyz2 = jnp.asarray(xyz1[:, :M])  # sparse set = FPS-like subset
        pre = jnp.asarray(r.randn(B, M, C1).astype(np.float32)).astype(DTYPE)
        skip = jnp.asarray(r.randn(B, N, C1).astype(np.float32)).astype(DTYPE)

        fz = jax.jit(lambda p: pk.fused_fp_pallas(xyz1, xyz2, p, skip))
        fc = jax.jit(lambda p: composition(xyz1, xyz2, p, skip))
        oz = np.asarray(fz(pre), np.float32)
        oc = np.asarray(fc(pre), np.float32)
        scale = max(np.abs(oc).max(), 1e-9)
        print(f"{name}: |fused-comp|rel={np.abs(oz - oc).max() / scale:.3e}",
              flush=True)

        def chainable(fn):
            def f(p):
                o = fn(p)
                return p + (1e-6 * o.astype(jnp.float32).mean()).astype(DTYPE)
            return f

        tz = chain_time(chainable(fz), pre, k1=5, k2=25, reps=3) * 1e3
        tc = chain_time(chainable(fc), pre, k1=5, k2=25, reps=3) * 1e3
        print(f"{name}: composition {tc:.3f} ms   fused {tz:.3f} ms   "
              f"ratio {tc / max(tz, 1e-9):.2f}x", flush=True)


if __name__ == "__main__":
    main()

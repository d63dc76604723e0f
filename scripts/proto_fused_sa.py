#!/usr/bin/env python
"""Real-TPU probe: fused SA kernel correctness + speed at bench shapes.

Compares fused_sa_pallas against the XLA project_first composition at
the SA1/SA2 shapes of the fusion bench (B=64, N=1024) and times both.
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
from mm3d_tpu.utils.profiling import chain_time

DT = jnp.bfloat16 if os.environ.get(
    "MM3D_PROTO_DTYPE", "bfloat16") == "bfloat16" else jnp.float32


def case(name, B, N, S, K, radius, C1, C2, C3, seed=0):
    r = np.random.RandomState(seed)
    xyz = jnp.asarray(r.randn(B, N, 3).astype(np.float32) * 0.5)
    fidx = jax.jit(lambda p: pk.fps_pallas(p, S))(xyz)
    new_xyz = G.index_points(xyz, fidx)
    pre = jnp.asarray(r.randn(B, N, C1).astype(np.float32)).astype(DT)
    cbias = jnp.asarray(r.randn(B, S, C1).astype(np.float32)).astype(DT)
    w1 = jnp.asarray(r.randn(C1, C2).astype(np.float32) * .2).astype(DT)
    b1 = jnp.asarray(r.randn(C2).astype(np.float32)).astype(DT)
    w2 = jnp.asarray(r.randn(C2, C3).astype(np.float32) * .2).astype(DT)
    b2 = jnp.asarray(r.randn(C3).astype(np.float32)).astype(DT)

    def xla_path(p):
        idx = pk.ball_query_pallas(radius, K, xyz, new_xyz)
        g = G.index_points(p, idx)
        h = jax.nn.relu(g + cbias[:, :, None, :])
        h = jax.nn.relu(h @ w1 + b1)
        h = jax.nn.relu(h @ w2 + b2)
        return jnp.max(h, axis=2).astype(jnp.float32)

    def fused_path(p):
        return pk.fused_sa_pallas(radius, K, xyz, new_xyz, p, cbias,
                                  w1, b1, w2, b2).astype(jnp.float32)

    want = np.asarray(jax.jit(xla_path)(pre))
    got = np.asarray(jax.jit(fused_path)(pre))
    err = np.abs(got - want).max()
    rel = err / (np.abs(want).max() + 1e-9)
    t_xla = chain_time(xla_path, pre) * 1e3
    t_fused = chain_time(fused_path, pre) * 1e3
    print(f"{name}: maxdiff={err:.4g} rel={rel:.4g}  "
          f"xla(bq+gather+mlp+max)={t_xla:.3f} ms  fused={t_fused:.3f} ms  "
          f"speedup={t_xla / t_fused:.2f}x", flush=True)


if __name__ == "__main__":
    case("SA1 (N=1024,S=512,K=32,C 64/64/128)",
         64, 1024, 512, 32, 0.2, 64, 64, 128)
    case("SA2 (N=512,S=128,K=64,C 128/128/256)",
         64, 512, 128, 64, 0.4, 128, 128, 256)

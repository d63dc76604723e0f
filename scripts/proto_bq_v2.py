#!/usr/bin/env python
"""Real-TPU race: ball query v1 (k-step extract-min) vs v2 (rank scan +
MXU index extraction) at the bench shapes, plus exactness vs the
pure-JAX oracle-parity path."""

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


def case(name, B, N, S, K, radius, seed=0):
    r = np.random.RandomState(seed)
    xyz = jnp.asarray(r.randn(B, N, 3).astype(np.float32) * 0.5)
    new = G.index_points(xyz, jax.jit(lambda p: pk.fps_pallas(p, S))(xyz))

    want = np.asarray(jax.jit(
        lambda a, b: G._query_ball_jax(radius, K, a, b))(xyz, new))
    got1 = np.asarray(jax.jit(
        lambda a, b: pk.ball_query_pallas(radius, K, a, b))(xyz, new))
    got2 = np.asarray(jax.jit(
        lambda a, b: pk.ball_query_v2_pallas(radius, K, a, b))(xyz, new))
    ok1 = (got1 == want).all()
    ok2 = (got2 == want).all()

    def v1(nx):
        return pk.ball_query_pallas(radius, K, xyz, nx).astype(jnp.float32)

    def v2(nx):
        return pk.ball_query_v2_pallas(radius, K, xyz,
                                       nx).astype(jnp.float32)

    t1 = np.median([chain_time(v1, new) for _ in range(3)]) * 1e3
    t2 = np.median([chain_time(v2, new) for _ in range(3)]) * 1e3
    print(f"{name}: v1 exact={bool(ok1)} {t1:.3f} ms | "
          f"v2 exact={bool(ok2)} {t2:.3f} ms | v2 speedup {t1/t2:.2f}x",
          flush=True)


if __name__ == "__main__":
    case("SA1 (N=1024,S=512,K=32)", 64, 1024, 512, 32, 0.2)
    case("SA2 (N=512,S=128,K=64)", 64, 512, 128, 64, 0.4)
    case("semseg (N=4096,S=1024,K=32)", 8, 4096, 1024, 32, 0.1)

#!/usr/bin/env python
"""Race FPS v2 (interleaved independent batch chains) vs the r1 kernel
on the real chip; exactness vs the pure-JAX reference.

Run:  python scripts/proto_fps_v2.py [nsplit ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mm3d_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from mm3d_tpu.ops import pallas_kernels as pk
from mm3d_tpu.ops.geometry import _fps_jax
from mm3d_tpu.utils.profiling import chain_time

SHAPES = [(64, 1024, 512), (64, 512, 128), (8, 4096, 1024),
          (256, 1024, 512), (128, 1024, 512), (128, 512, 128)]
if os.environ.get("MM3D_FPS_SHAPES"):  # e.g. "128,1024,512;128,512,128"
    SHAPES = [tuple(int(v) for v in grp.split(","))
              for grp in os.environ["MM3D_FPS_SHAPES"].split(";")]


def main():
    splits = [int(a) for a in sys.argv[1:]] or [2, 4]
    r = np.random.RandomState(0)
    for B, N, S in SHAPES:
        xyz = jnp.asarray(r.randn(B, N, 3).astype(np.float32))
        ref = np.asarray(jax.jit(
            lambda p: pk.fps_pallas(p, S))(xyz))
        refj = np.asarray(_fps_jax(xyz, S))
        rows = []
        for ns in splits:
            v2 = np.asarray(jax.jit(functools_partial(ns, S))(xyz))
            rows.append((ns, (v2 == refj).all()))
        print(f"B={B} N={N} S={S}: v1_exact={(ref == refj).all()} "
              f"v2_exact={rows}", flush=True)

        def c1(p):
            return pk.fps_pallas(p, S).astype(jnp.float32)

        t1 = chain_time(c1, xyz, reps=3) * 1e3
        line = f"B={B} N={N} S={S}: v1 {t1:.3f} ms"
        for ns in splits:
            tv = chain_time(
                (lambda nss: lambda p: pk.fps_pallas_v2(
                    p, S, nsplit=nss).astype(jnp.float32))(ns),
                xyz, reps=3) * 1e3
            line += f"   v2(ns={ns}) {tv:.3f} ms"
        print(line, flush=True)


def functools_partial(ns, S):
    return lambda p: pk.fps_pallas_v2(p, S, nsplit=ns)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Real-TPU correctness checks (run manually / by CI on a TPU host).

The pytest suite pins the CPU backend for determinism; this script
exercises the Pallas kernels and the end-to-end forward on the real
chip and compares against the torch-CPU oracle:
  python scripts/run_tpu_checks.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from mm3d_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import torch

    import mm3d_tpu.ops as ops
    from mm3d_tpu.ops import pallas_kernels as pk
    from oracle import torch_ops as tops

    assert jax.default_backend() in ("tpu", "axon"), jax.default_backend()
    failures = []

    B, N, S, NP, r, K = 16, 1024, 512, 512, 0.2, 32
    xyz = jnp.asarray(np.random.RandomState(0).randn(B, N, 3).astype(np.float32))
    txyz = torch.from_numpy(np.array(xyz))

    got = np.asarray(jax.jit(lambda p: pk.fps_pallas(p, NP))(xyz))
    want = tops.farthest_point_sample(txyz, NP).numpy()
    ok = (got == want).all()
    print(f"fps_pallas == torch oracle: {bool(ok)}")
    if not ok:
        failures.append("fps")

    new = xyz[:, :S]
    got = np.asarray(jax.jit(
        lambda a, b: pk.ball_query_pallas(r, K, a, b))(xyz, new))
    want = tops.query_ball_point(r, K, txyz, torch.from_numpy(np.array(new))).numpy()
    ok = (got == want).all()
    print(f"ball_query_pallas == torch oracle: {bool(ok)}")
    if not ok:
        failures.append("ball_query")

    dense = xyz
    sparse = xyz[:, :128]
    gd, gi = np.asarray(jax.jit(pk.three_nn_pallas)(dense, sparse)[0]), \
        np.asarray(jax.jit(pk.three_nn_pallas)(dense, sparse)[1])
    wd, wi = tops.three_nn(txyz, torch.from_numpy(np.array(sparse)))
    ok = (gi == wi.numpy()).all() and np.allclose(
        gd, wd.numpy(), rtol=1e-4, atol=1e-5)
    print(f"three_nn_pallas == torch oracle: {bool(ok)}")
    if not ok:
        failures.append("three_nn")

    # dispatch auto mode picks the kernels on TPU
    with ops.use_impl("auto"):
        idx = np.asarray(jax.jit(
            lambda p: ops.farthest_point_sample(p, NP))(xyz))
    ok = (idx == tops.farthest_point_sample(txyz, NP).numpy()).all()
    print(f"auto-dispatch FPS on TPU == oracle: {bool(ok)}")
    if not ok:
        failures.append("dispatch")

    if failures:
        print("FAILED:", failures)
        sys.exit(1)
    print("ALL TPU CHECKS PASSED")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Training-step throughput + round-2 kernel stage timings on the TPU.

Training is timed by chaining real steps (state_{i+1} = step(state_i))
and taking the slope between two chain lengths with a final device
fetch — same honest-timing rationale as bench.py (this host's
block_until_ready returns early).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mm3d_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from mm3d_tpu import ops
from mm3d_tpu.ops import geometry as G
from mm3d_tpu.ops import pallas_kernels as pk
from mm3d_tpu.utils.profiling import chain_time

B, N, S1, K1, S2, K2 = 64, 1024, 512, 32, 128, 64


def time_train_steps(step, state0, batch, lr, bn, key, m1=3, m2=13,
                     reps=3):
    def run(m):
        st = state0
        for i in range(m):
            st, metrics = step(st, batch, lr, bn, key)
        np.asarray(metrics["loss"])
        return st

    run(m1)  # warm
    run(m2)
    # per-side minima (see utils/profiling.chain_time): min each chain
    # length over reps, then one slope
    t1s, t2s = [], []
    for _ in range(reps):
        t0 = time.perf_counter(); run(m1); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); run(m2); t2s.append(time.perf_counter() - t0)
    return (min(t2s) - min(t1s)) / (m2 - m1)


def train_step_numbers():
    """fp32 + bf16 mixed-precision train-step timings (the two headline
    training rows) as a dict — the --json artifact (VERDICT r2 item 5)."""
    r = np.random.RandomState(0)
    xyz = jnp.asarray(r.randn(B, N, 3).astype(np.float32))
    labels = jnp.asarray(r.randint(0, 40, (B,)).astype(np.int32))

    from mm3d_tpu.models import get_model
    from mm3d_tpu.training import steps
    from mm3d_tpu.training.state import create_train_state, make_optimizer

    spec = get_model("pointnet2_cls_ssg")
    tx = make_optimizer("adam")
    augs = ("random_point_dropout", "random_scale_point_cloud",
            "shift_point_cloud")
    out = {"model": "pointnet2_cls_ssg", "batch": B, "npoint": N,
           "timing": "per-side-minima chain slope"}
    for label, kwargs in (("fp32", {}), ("bf16", {"dtype": jnp.bfloat16})):
        model = spec.builder(num_class=40, **kwargs)
        state = create_train_state(model, tx, jax.random.PRNGKey(0), (xyz,))
        step = steps.make_train_step(model, spec.loss, tx, "classification",
                                     augment_names=augs, donate=False)
        sec = time_train_steps(step, state, (xyz, labels), 1e-3, 0.1,
                               jax.random.PRNGKey(1))
        out[f"{label}_ms_per_step"] = round(sec * 1e3, 2)
        out[f"{label}_clouds_per_s"] = round(B / sec, 1)
    return out


def main():
    r = np.random.RandomState(0)
    xyz = jnp.asarray(r.randn(B, N, 3).astype(np.float32))
    new_xyz = G.index_points(xyz, jax.jit(
        lambda p: pk.fps_pallas(p, S1))(xyz))

    def bq1(nx):
        return pk.ball_query_pallas(0.2, K1, xyz, nx).astype(jnp.float32)

    ms = chain_time(bq1, new_xyz) * 1e3
    print(f"bq_v2 (S=512,K=32,N=1024): {ms:.3f} ms  (r1 kernel: 4.448)",
          flush=True)

    xyz2 = new_xyz
    n2 = G.index_points(xyz2, jax.jit(lambda p: pk.fps_pallas(p, S2))(xyz2))

    def bq2(nx):
        return pk.ball_query_pallas(0.4, K2, xyz2, nx).astype(jnp.float32)

    ms = chain_time(bq2, n2) * 1e3
    print(f"bq_v2 (S=128,K=64,N=512):  {ms:.3f} ms  (r1 kernel: 0.985)",
          flush=True)

    # gather backward: pallas one-hot-transpose matmul vs XLA scatter-add
    g1 = jnp.asarray(r.randn(B, S1, K1, 64).astype(np.float32))
    idx1 = jax.jit(lambda a, b: pk.ball_query_pallas(0.2, K1, a, b))(
        xyz, new_xyz)

    def bwd_pallas(g):
        return pk.gather_bwd_pallas(g, idx1, N)

    def bwd_xla(g):
        C = g.shape[-1]
        flat = jnp.zeros((B * N, C), g.dtype)
        offs = (jnp.arange(B, dtype=idx1.dtype) * N).reshape(B, 1, 1)
        return flat.at[(idx1 + offs).reshape(-1)].add(
            g.reshape(-1, C)).reshape(B, N, C)

    a = np.asarray(jax.jit(bwd_pallas)(g1))
    b = np.asarray(jax.jit(bwd_xla)(g1))
    print(f"gather_bwd parity (SA1 shape): maxdiff "
          f"{np.abs(a - b).max():.3g}", flush=True)
    ms_p = chain_time(bwd_pallas, g1) * 1e3
    ms_x = chain_time(bwd_xla, g1) * 1e3
    print(f"gather_bwd SA1 [B,512,32,64]->[B,1024,64]: pallas {ms_p:.3f} "
          f"ms  xla scatter {ms_x:.3f} ms  ({ms_x / ms_p:.1f}x)",
          flush=True)

    # bilinear kernel stage
    fmap = jnp.asarray(
        r.randn(B, 16, 16, 128).astype(np.float32)).astype(jnp.bfloat16)
    uv = jnp.asarray((r.rand(B, N, 2) * 15).astype(np.float32))

    def bil_k(u):
        return pk.bilinear_sample_pallas(fmap, u).astype(jnp.float32)

    from mm3d_tpu.ops import projection as proj

    def bil_j(u):
        return proj._bilinear_sample_jax(fmap, u).astype(jnp.float32)

    ms_k = chain_time(bil_k, uv) * 1e3
    ms_j = chain_time(bil_j, uv) * 1e3
    print(f"bilinear [B,1024]x[16x16x128]: pallas {ms_k:.3f} ms  "
          f"xla {ms_j:.3f} ms", flush=True)

    # full training step, pn2_cls_ssg (the r1 BASELINE.md training row)
    from mm3d_tpu.models import get_model
    from mm3d_tpu.training import steps
    from mm3d_tpu.training.state import create_train_state, make_optimizer

    spec = get_model("pointnet2_cls_ssg")
    model = spec.builder(num_class=40)
    tx = make_optimizer("adam")
    labels = jnp.asarray(r.randint(0, 40, (B,)).astype(np.int32))
    state = create_train_state(model, tx, jax.random.PRNGKey(0), (xyz,))
    step = steps.make_train_step(
        model, spec.loss, tx, "classification",
        augment_names=("random_point_dropout", "random_scale_point_cloud",
                       "shift_point_cloud"),
        donate=False)
    sec = time_train_steps(step, state, (xyz, labels), 1e-3, 0.1,
                           jax.random.PRNGKey(1))
    print(f"train step pn2_cls_ssg B=64: {sec * 1e3:.2f} ms = "
          f"{B / sec:.0f} clouds/s  (r1: 69.5 ms / 921)", flush=True)

    # mixed-precision training mode (bf16 compute, f32 master weights)
    model16 = spec.builder(num_class=40, dtype=jnp.bfloat16)
    state16 = create_train_state(model16, tx, jax.random.PRNGKey(0), (xyz,))
    step16 = steps.make_train_step(
        model16, spec.loss, tx, "classification",
        augment_names=("random_point_dropout", "random_scale_point_cloud",
                       "shift_point_cloud"),
        donate=False)
    sec = time_train_steps(step16, state16, (xyz, labels), 1e-3, 0.1,
                           jax.random.PRNGKey(1))
    print(f"train step pn2_cls_ssg B=64 bf16 mixed-precision: "
          f"{sec * 1e3:.2f} ms = {B / sec:.0f} clouds/s", flush=True)


if __name__ == "__main__":
    if "--json" in sys.argv:
        import json
        print(json.dumps(train_step_numbers()))
    else:
        main()

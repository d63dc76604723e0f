#!/usr/bin/env python
"""Batch-size sweep for the north-star serving bench (round 5).

bench.py fixes BATCH=64 (historical: the r1 value).  A serving
deployment picks the throughput-optimal batch, and per-cloud cost is
not flat in B: FPS/ball-query rows scale linearly but the image CNN and
kernel grid setup amortize.  Sweep the same fusion_cls bf16 forward at
B in {32, 64, 128, 256} with bench.py's exact chain-slope methodology
and report clouds/s per B.  If a larger B wins decisively, bench.py's
BATCH gets bumped (documented in BASELINE.md).

Run on chip:  python scripts/proto_bench_batch.py
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

NPOINT = 1024
IMAGE_HW = (64, 64)
K1, K2 = 5, 25


def bench_at(model, B):
    def mkbatch(seed):
        r = np.random.RandomState(seed)
        pts = r.randn(B, NPOINT, 3).astype(np.float32)
        pts -= pts.mean(1, keepdims=True)
        pts /= np.linalg.norm(pts, axis=-1, keepdims=True).max(
            1, keepdims=True)
        return (jnp.asarray(pts),
                jnp.asarray(r.rand(B, *IMAGE_HW, 3).astype(np.float32)),
                jnp.asarray(np.broadcast_to(
                    np.eye(3, dtype=np.float32) * 32, (B, 3, 3)).copy()),
                jnp.asarray(np.broadcast_to(
                    np.eye(3, dtype=np.float32), (B, 3, 3)).copy()),
                jnp.asarray(np.tile(np.array([0, 0, 3], np.float32),
                                    (B, 1))))

    b0, b1 = mkbatch(0), mkbatch(1)
    variables = jax.jit(
        lambda *a: model.init({"params": jax.random.PRNGKey(0),
                               "dropout": jax.random.PRNGKey(1)},
                              *a, train=True))(*b0)

    @jax.jit
    def chained(v, pts, img, K, R, t, n_loops):
        def body(i, p):
            log_probs, _ = model.apply(v, p, img, K, R, t, train=False)
            return p + 1e-6 * jnp.mean(log_probs)
        return jnp.mean(jax.lax.fori_loop(0, n_loops, body, pts))

    def run(k, batch):
        np.asarray(chained(variables, *batch, k))

    run(K1, b0)
    run(K2, b0)
    t1s, t2s = [], []
    for _ in range(5):
        t0 = time.perf_counter(); run(K1, b1); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); run(K2, b1); t2s.append(time.perf_counter() - t0)
    per_fwd = (min(t2s) - min(t1s)) / (K2 - K1)
    return per_fwd


def main():
    from mm3d_tpu.models import get_model

    spec = get_model("fusion_cls")
    model = spec.builder(num_class=40, dtype=jnp.bfloat16)
    batches = (tuple(int(b) for b in sys.argv[1:]) if len(sys.argv) > 1
               else (32, 64, 128, 256))
    for B in batches:
        try:
            sec = bench_at(model, B)
        except Exception as e:  # noqa: BLE001 — e.g. VMEM limits at big B
            print(f"B={B}: FAILED ({type(e).__name__}: {str(e)[:120]})",
                  flush=True)
            continue
        print(f"B={B}: {sec * 1e3:.2f} ms/fwd = {B / sec:.1f} clouds/s",
              flush=True)


if __name__ == "__main__":
    main()

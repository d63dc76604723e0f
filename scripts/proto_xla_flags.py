#!/usr/bin/env python
"""XLA compiler-options race on the full train step (round 5).

The r5 roofline closure showed the unfused train path moves ~4.7x the
semantically-required grouped-activation bytes — it is XLA-SCHEDULING-
bound, not bandwidth-bound, and every implemented kernel attack lost
its measured race (BASELINE.md r5).  The one untried lever is the
compiler itself: TPU XLA exposes scheduling/fusion knobs that are
normally reached via XLA_FLAGS, but on this host compiles happen on the
far side of the axon tunnel, so env flags may never arrive.  Per-compile
`compiler_options` (jit(...).lower(...).compile(compiler_options=...))
ride the PJRT compile request and DO arrive.

This script races the fp32 and bf16 pn2_cls_ssg train step (the
TRAIN_BENCH.json configuration, B=64 N=1024) under a small set of
plausible options vs the default compile.  Unknown/rejected options are
reported and skipped — that in itself documents which knobs the tunnel
accepts.

Run on chip:  python scripts/proto_xla_flags.py
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

B, N = 64, 1024

# Candidate option sets.  Names follow the public XLA debug-options
# vocabulary; anything the backend rejects is recorded as such.
VARIANTS = [
    ("default", None),
    ("vmem_x2", {"xla_tpu_scoped_vmem_limit_kib": "32768"}),
    ("vmem_x4", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
    ("lhs", {"xla_tpu_enable_latency_hiding_scheduler": "true"}),
    ("no_rwb", {"xla_tpu_rwb_fusion": "false"}),
    ("slop95", {"xla_tpu_memory_limit_slop_factor": "95"}),
]


def time_compiled(fn, state0, batch, lr, bn, key, m1=3, m2=13, reps=3):
    def run(m):
        st = state0
        for _ in range(m):
            st, metrics = fn(st, batch, lr, bn, key)
        np.asarray(metrics["loss"])
        return st

    run(m1)
    run(m2)
    t1s, t2s = [], []
    for _ in range(reps):
        t0 = time.perf_counter(); run(m1); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); run(m2); t2s.append(time.perf_counter() - t0)
    return (min(t2s) - min(t1s)) / (m2 - m1)


def main():
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

    for label, kwargs in (("fp32", {}), ("bf16", {"dtype": jnp.bfloat16})):
        model = spec.builder(num_class=40, **kwargs)
        state = create_train_state(model, tx, jax.random.PRNGKey(0), (xyz,))
        step = steps.make_train_step(model, spec.loss, tx, "classification",
                                     augment_names=augs, donate=False)
        # step is already jax.jit-wrapped: .lower works directly on it
        args = (state, (xyz, labels), 1e-3, 0.1, jax.random.PRNGKey(1))
        lowered = step.lower(*args)
        base_ms = None
        for name, opts in VARIANTS:
            try:
                compiled = (lowered.compile() if opts is None
                            else lowered.compile(compiler_options=opts))
            except Exception as e:  # noqa: BLE001 — report rejected knobs
                print(f"{label} {name}: REJECTED ({type(e).__name__}: "
                      f"{str(e)[:120]})", flush=True)
                continue
            try:
                sec = time_compiled(compiled, *args)
            except Exception as e:  # noqa: BLE001
                print(f"{label} {name}: RUN FAILED ({type(e).__name__}: "
                      f"{str(e)[:120]})", flush=True)
                continue
            ms = sec * 1e3
            if base_ms is None and name == "default":
                base_ms = ms
            rel = f"  ({base_ms / ms:.2f}x vs default)" if base_ms else ""
            print(f"{label} {name}: {ms:.2f} ms/step = "
                  f"{B / sec:.0f} clouds/s{rel}", flush=True)


if __name__ == "__main__":
    main()

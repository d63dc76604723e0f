#!/usr/bin/env python
"""North-star benchmark (BASELINE.json:2): clouds/sec/chip for 1024-pt
multimodal PointNet++ inference (config 4: point trunk + image CNN +
late fusion) on one TPU chip.

Methodology: on this host the TPU is reached through a tunnel whose
`block_until_ready` returns before remote execution finishes, so naive
timing overcounts throughput by >100x.  We instead time a dependent
`lax.fori_loop` chain (iteration i+1 consumes iteration i's output) at
two chain lengths and take the slope — fixed overhead (dispatch, H2D,
fetch) cancels, leaving the true per-forward latency.

vs_baseline is the speedup over the measured reference CPU throughput
(torch eval-mode oracle on this host, BASELINE.md: 5.73 clouds/s).
Prints exactly one JSON line.
"""

import json
import time

# Measured via oracle/torch_models.FusionCls, torch CPU (1 thread),
# batch 8 x 1024 pts x 64x64 image, eval mode — see BASELINE.md.
CPU_BASELINE_CLOUDS_PER_S = 5.73

# throughput-optimal serving batch, measured r5 (scripts/proto_bench_batch.py
# same chain-slope methodology): B=32 14,010 / B=64 14,858 / B=128 15,334 /
# B=256 13,950 clouds/s — FPS+ball-query rows scale linearly but kernel grid
# setup and the image CNN amortize up to B=128; B=256 regresses (tiling).
BATCH = 128
NPOINT = 1024
IMAGE_HW = (64, 64)
K1, K2 = 5, 25
# bf16 serving mode: network compute in bfloat16, geometry fp32.
# Verified argmax agreement 1.0 / max |dlogp| 2.5e-3 vs fp32 on this
# workload (tests/test_inference.py re-checks). MM3D_BENCH_DTYPE=float32
# benches the strict-parity mode instead.
import os
DTYPE = os.environ.get("MM3D_BENCH_DTYPE", "bfloat16")
if DTYPE not in ("bfloat16", "float32"):
    # a typo ('bf16') would otherwise silently bench fp32 and the
    # driver would record it as the bf16 figure (code-review r5)
    print(json.dumps({"error": f"MM3D_BENCH_DTYPE must be bfloat16|"
                               f"float32, got {DTYPE!r}"}), flush=True)
    raise SystemExit(2)


def _backend_watchdog(seconds=180):
    """Fail fast if the axon backend is unreachable.

    During the 2026-08-17 relay outage, backend init hung ~10 min before
    erroring; a hung bench run wastes the driver's round-end budget.  A
    daemon timer hard-exits (rc 3, message on stderr) unless cancelled
    right after `jax.devices()` succeeds."""
    import sys
    import threading

    def boom():
        import json
        msg = (f"TPU backend init exceeded {seconds}s "
               "(axon relay down?)")
        # the one-JSON-line contract holds even on outage: the driver's
        # parsed field then carries the reason instead of null
        # (VERDICT r4 weak 6)
        print(json.dumps({"error": msg}), flush=True)
        print(f"bench.py: {msg} — aborting", file=sys.stderr)
        os._exit(3)

    t = threading.Timer(seconds, boom)
    t.daemon = True
    t.start()
    return t


def main():
    from mm3d_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    wd = _backend_watchdog()
    import jax
    jax.devices()  # force backend init under the watchdog
    wd.cancel()
    import jax.numpy as jnp
    import numpy as np
    from mm3d_tpu.models import get_model

    spec = get_model("fusion_cls")
    model = spec.builder(
        num_class=40,
        dtype=jnp.bfloat16 if DTYPE == "bfloat16" else None)

    def mkbatch(seed):
        r = np.random.RandomState(seed)
        # unit-sphere clouds (pc_normalize convention) — what the models
        # actually see, so in-ball hit statistics are representative
        pts = r.randn(BATCH, NPOINT, 3).astype(np.float32)
        pts -= pts.mean(1, keepdims=True)
        pts /= np.linalg.norm(pts, axis=-1, keepdims=True).max(
            1, keepdims=True)
        return (jnp.asarray(pts),
                jnp.asarray(r.rand(BATCH, *IMAGE_HW, 3).astype(np.float32)),
                jnp.asarray(np.broadcast_to(
                    np.eye(3, dtype=np.float32) * 32, (BATCH, 3, 3)).copy()),
                jnp.asarray(np.broadcast_to(
                    np.eye(3, dtype=np.float32), (BATCH, 3, 3)).copy()),
                jnp.asarray(np.tile(np.array([0, 0, 3], np.float32),
                                    (BATCH, 1))))

    b0, b1 = mkbatch(0), mkbatch(1)
    variables = jax.jit(
        lambda *a: model.init({"params": jax.random.PRNGKey(0),
                               "dropout": jax.random.PRNGKey(1)},
                              *a, train=True))(*b0)

    @jax.jit
    def chained(v, pts, img, K, R, t, n_loops):
        def body(i, p):
            log_probs, _ = model.apply(v, p, img, K, R, t, train=False)
            return p + 1e-6 * jnp.mean(log_probs)  # serialize iterations
        # reduce the carry to a SCALAR before the host fetch, exactly
        # like utils.profiling.chain_time: the full [B,N,3] carry is
        # ~768 KB per fetch and the tunnel's D2H variance would bias
        # the slope (code-review r5)
        return jnp.mean(jax.lax.fori_loop(0, n_loops, body, pts))

    def run(k, batch):
        out = chained(variables, *batch, k)
        np.asarray(out)  # real fetch = real completion

    run(K1, b0)  # warm both trace shapes (n_loops is traced, same graph)
    run(K2, b0)

    # the shared chip shows ±15% minute-scale variance through the
    # tunnel: time each chain length 5x and slope the per-side minima
    # (min-of-each-side is the clean-run estimate; min-of-slopes would
    # be optimistically biased by a slow short-chain run)
    t1s, t2s = [], []
    for _ in range(5):
        t0 = time.perf_counter(); run(K1, b1); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); run(K2, b1); t2s.append(time.perf_counter() - t0)
    per_fwd = (min(t2s) - min(t1s)) / (K2 - K1)

    clouds_per_s = BATCH / per_fwd
    print(json.dumps({
        "metric": "clouds/sec/chip (1024-pt multimodal PointNet++ fusion inference)",
        "value": round(clouds_per_s, 1),
        "unit": "clouds/s",
        "vs_baseline": round(clouds_per_s / CPU_BASELINE_CLOUDS_PER_S, 1),
        "dtype": DTYPE,
    }))


if __name__ == "__main__":
    main()

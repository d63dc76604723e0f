#!/usr/bin/env python
"""Service-level serving benchmark: live jitted predictor vs exported
StableHLO artifact vs the HTTP daemon, on whatever backend the process
sees (TPU via the axon tunnel, or --platform cpu).

Three numbers per config, all clouds/s:

* ``live``     — the jitted eval forward (chain-slope timing: the
                 tunnel's ``block_until_ready`` returns early, so naive
                 timing overcounts; see bench.py / CLAUDE.md).
* ``artifact`` — ``PredictionService.predict`` wall-clock including the
                 numpy H2D/D2H roundtrip (the honest deployment cost: a
                 server cannot keep results on device).
* ``http``     — full daemon loopback roundtrip (npz encode + HTTP +
                 pad/chunk + npz decode), batch == artifact batch.

Prints ONE JSON line:
  {"metric": "serving_clouds_per_s", "live": .., "artifact": ..,
   "http": .., "batch": .., "model": ..}

Usage:
  python scripts/bench_serving.py [--model pointnet2_cls_ssg]
      [--batch 64] [--npoint 1024] [--impl jax|pallas]
      [--platform auto|cpu|tpu] [--repeats 20]

The pallas impl requires a TPU backend (Mosaic custom calls); it is the
serving-speed path the fused kernels power.  `scripts/r5_tpu_backlog.sh`
runs both impls on chip when the outage ends.
"""

import argparse
import io
import json
import os
import sys
import threading
import time
import urllib.request

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="pointnet2_cls_ssg")
    p.add_argument("--num_class", type=int, default=40)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--npoint", type=int, default=1024)
    p.add_argument("--impl", default="jax", choices=["jax", "pallas"])
    p.add_argument("--platform", default="auto")
    p.add_argument("--repeats", type=int, default=20)
    a = p.parse_args(argv)

    import jax
    if a.platform != "auto":
        jax.config.update("jax_platforms", a.platform)
    import jax.numpy as jnp
    from mm3d_tpu import ops, serving
    from mm3d_tpu.models import get_model
    from mm3d_tpu.training import inference
    from mm3d_tpu.utils.cache import enable_compilation_cache
    from mm3d_tpu.utils.profiling import chain_time

    enable_compilation_cache()
    if a.impl == "pallas" and jax.default_backend() not in ("tpu", "axon"):
        # off-TPU the kernels auto-route to interpret mode — the JSON
        # would report a 'pallas' number that measures emulation (the
        # same bug class test.py --export guards against)
        raise SystemExit("--impl pallas needs a TPU backend; this host "
                         f"is {jax.default_backend()!r}")
    spec = get_model(a.model)
    model = spec.builder(num_class=a.num_class)
    r = np.random.RandomState(0)
    pts_np = r.randn(a.batch, a.npoint, 3).astype(np.float32)
    pts_np /= np.linalg.norm(pts_np, axis=-1, keepdims=True).max(
        axis=1, keepdims=True)  # unit-sphere clouds, bench.py convention
    pts = jnp.asarray(pts_np)
    v = jax.jit(lambda: model.init(
        {"params": jax.random.PRNGKey(0),
         "dropout": jax.random.PRNGKey(1)}, pts, train=True))()
    predict = jax.jit(lambda x: model.apply(v, x, train=False)[0])

    with ops.use_impl(a.impl):
        t_live = chain_time(predict, pts)
        exported = inference.export_serving(
            predict, (pts,), allow_tpu_kernels=(a.impl == "pallas"))
    import tempfile
    path = os.path.join(tempfile.mkdtemp(), "bench.stablehlo")
    inference.save_serving(path, exported)

    service = serving.PredictionService(path)
    service.warmup()

    def wall(fn, n):
        fn()  # one more warm call outside the clock
        t0 = time.perf_counter()
        for _ in range(n):
            fn()
        return (time.perf_counter() - t0) / n

    t_art = wall(lambda: service.predict(pts_np), a.repeats)

    server = serving.make_server(service)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    buf = io.BytesIO()
    np.savez(buf, arg0=pts_np)
    body = buf.getvalue()

    def post():
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=body, method="POST")
        with urllib.request.urlopen(req, timeout=600) as resp:
            np.load(io.BytesIO(resp.read()))["log_probs"]

    t_http = wall(post, a.repeats)
    server.shutdown()

    print(json.dumps({
        "metric": "serving_clouds_per_s",
        "live": round(a.batch / t_live, 1),
        "artifact": round(a.batch / t_art, 1),
        "http": round(a.batch / t_http, 1),
        "batch": a.batch, "npoint": a.npoint,
        "model": a.model, "impl": a.impl,
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()

"""Round-5 loose end: the HTTP serving daemon driven end-to-end ON the
real TPU — export a pointnet2_cls_ssg eval forward to a StableHLO
artifact, launch `python -m mm3d_tpu.serving` as a subprocess, POST a
real request, and compare against the live in-process forward.

The first attempt (scripts/r5_tpu_loose_ends.sh) timed out at 1800 s
with zero output: the parent's init/pred compiles + the export + the
daemon's warmup compile all went cold through the remote-compile
tunnel.  Since then the daemon enables the persistent compilation cache
in main() (mm3d_tpu/serving.py), and the exported artifact pins the
pure-XLA op path (cacheable, no Mosaic custom calls) — this run both
validates the daemon on TPU and exercises that cache path.
"""
import io
import os
import re
import subprocess
import sys
import tempfile
import urllib.request

import numpy as np
import jax
import jax.numpy as jnp

from mm3d_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from mm3d_tpu.models import get_model
from mm3d_tpu.training import inference

spec = get_model("pointnet2_cls_ssg")
model = spec.builder(num_class=40)
pts = jnp.asarray(
    np.random.RandomState(0).randn(24, 1024, 3).astype(np.float32))
v = jax.jit(lambda: model.init({"params": jax.random.PRNGKey(0),
                                "dropout": jax.random.PRNGKey(1)},
                               pts, train=True))()
pred = jax.jit(lambda x: model.apply(v, x, train=False)[0])
tmp = tempfile.mkdtemp()
path = os.path.join(tmp, "m.shlo")
inference.save_serving(path, inference.export_serving(pred, (pts,)))
print("artifact exported", flush=True)

proc = subprocess.Popen([sys.executable, "-m", "mm3d_tpu.serving",
                         "--artifact", path, "--port", "0"],
                        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                        text=True)
try:
    base = None
    for _ in range(400):  # warnings/log lines precede the URL on merged streams
        line = proc.stdout.readline()
        if not line:
            break
        m = re.search(r"http://127\.0\.0\.1:\d+", line)
        if m:
            base = m.group(0)
            break
    assert base, "daemon never printed its URL"
    print("daemon up at", base, flush=True)
    buf = io.BytesIO()
    np.savez(buf, arg0=np.asarray(pts))
    req = urllib.request.Request(base + "/predict", data=buf.getvalue(),
                                 method="POST")
    with urllib.request.urlopen(req, timeout=900) as resp:
        out = np.load(io.BytesIO(resp.read()))["log_probs"]
    print("daemon on tpu: out", out.shape, "max|d| vs live:",
          float(np.abs(out - np.asarray(pred(pts))).max()), flush=True)
finally:
    proc.terminate()
    proc.wait(timeout=10)

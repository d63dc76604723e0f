#!/bin/bash
# Round-5 loose ends from remaining2: (a) the kNN given-idx fused-SA race
# (first run spent its budget on cold compiles — the cache is warm now),
# (b) the daemon on-chip smoke with the harness fixed to scan merged
# stdout+stderr lines for the URL (the axon platform warning precedes it).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

# ---- kNN given-idx fused SA tail race (fp32 + bf16) ----
timeout 1800 python - <<'EOF' 2>&1 | grep -v WARNING | tail -6
import numpy as np, jax, jax.numpy as jnp
from mm3d_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from mm3d_tpu.utils.profiling import chain_time
from mm3d_tpu.ops import geometry as G, pallas_kernels as pk

r = np.random.RandomState(0)
B, N, S, K, C1, C2, C3 = 24, 1024, 512, 32, 64, 64, 128
xyz = jnp.asarray(r.randn(B, N, 3).astype(np.float32) * 0.5)
new = G.index_points(xyz, G.farthest_point_sample(xyz, S))
pre0 = jnp.asarray(r.randn(B, N, C1).astype(np.float32))
cb0 = jnp.asarray(r.randn(B, S, C1).astype(np.float32))
w10 = jnp.asarray(r.randn(C1, C2).astype(np.float32) * .2)
b10 = jnp.asarray(r.randn(C2).astype(np.float32))
w20 = jnp.asarray(r.randn(C2, C3).astype(np.float32) * .2)
b20 = jnp.asarray(r.randn(C3).astype(np.float32))

def make(dt):
    cb, w1, b1, w2, b2 = (a.astype(dt) for a in (cb0, w10, b10, w20, b20))

    def unfused(p):
        i = G.knn_point(K, xyz, new)
        g = G.index_points(p, i)
        h = jax.nn.relu(g + cb[:, :, None, :])
        h = jax.nn.relu(h @ w1 + b1)
        h = jax.nn.relu(h @ w2 + b2)
        return p + 1e-9 * jnp.max(h, axis=2).mean().astype(p.dtype)

    def fused(p):
        i = G.knn_point(K, xyz, new)
        o = pk.fused_sa_idx_pallas(K, i, p, cb, w1, b1, w2, b2)
        return p + 1e-9 * o.mean().astype(p.dtype)

    return unfused, fused

for dt in (jnp.float32, jnp.bfloat16):
    unfused, fused = make(dt)
    pre_d = pre0.astype(dt)
    for name, fn in (("unfused", unfused), ("fused_idx", fused)):
        t = np.median([chain_time(jax.jit(fn), pre_d)
                       for _ in range(3)]) * 1e3
        print(f"knn SA1-tail {name} {jnp.dtype(dt).name}: {t:.3f} ms")
EOF

# ---- serving daemon on-chip smoke (fixed URL scan) ----
timeout 1800 python - <<'PYEOF' 2>&1 | grep -v WARNING | tail -4
import io, json, os, re, subprocess, sys, tempfile, urllib.request
import numpy as np, jax, jax.numpy as jnp
from mm3d_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from mm3d_tpu.models import get_model
from mm3d_tpu.training import inference

spec = get_model("pointnet2_cls_ssg")
model = spec.builder(num_class=40)
pts = jnp.asarray(np.random.RandomState(0).randn(24, 1024, 3).astype(np.float32))
v = jax.jit(lambda: model.init({"params": jax.random.PRNGKey(0),
                                "dropout": jax.random.PRNGKey(1)},
                               pts, train=True))()
pred = jax.jit(lambda x: model.apply(v, x, train=False)[0])
tmp = tempfile.mkdtemp()
path = os.path.join(tmp, "m.shlo")
inference.save_serving(path, inference.export_serving(pred, (pts,)))
proc = subprocess.Popen([sys.executable, "-m", "mm3d_tpu.serving",
                         "--artifact", path, "--port", "0"],
                        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                        text=True)
try:
    base = None
    for _ in range(200):  # warnings/log lines precede the URL on merged streams
        line = proc.stdout.readline()
        if not line:
            break
        m = re.search(r"http://127\.0\.0\.1:\d+", line)
        if m:
            base = m.group(0)
            break
    assert base, "daemon never printed its URL"
    buf = io.BytesIO(); np.savez(buf, arg0=np.asarray(pts))
    req = urllib.request.Request(base + "/predict", data=buf.getvalue(),
                                 method="POST")
    with urllib.request.urlopen(req, timeout=600) as resp:
        out = np.load(io.BytesIO(resp.read()))["log_probs"]
    print("daemon on tpu: out", out.shape, "max|d| vs live:",
          float(np.abs(out - np.asarray(pred(pts))).max()))
finally:
    proc.terminate(); proc.wait(timeout=10)
PYEOF

#!/bin/bash
# Round-5 remaining backlog, part 2: the r5 serving items (kNN race,
# knn model smoke, serving-export validation, serving benches, daemon
# smoke).  Split from part 1 so the evidence lands in two commits and a
# mid-run failure doesn't block the serving story.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

# ---- r5: given-idx fused SA tail (kNN serving) race ----
timeout 1200 python - <<'EOF' 2>&1 | grep -v WARNING | tail -6
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
    # cast EVERY operand so the unfused bf16 baseline is honest (an f32
    # cb would promote the grouped tensor + both matmuls back to f32)
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

# ---- r5: knn model serving smoke (explicit pallas exercises fused_sa_idx)
timeout 1200 python train.py --model pointnet2_cls_knn --epoch 1 --batch_size 16 \
  --train_size 32 --test_size 16 --bn_momentum 0.5 \
  --impl pallas --run_name r5_knn 2>&1 | grep final:
timeout 1200 python test.py --model pointnet2_cls_knn \
  --log_dir log/classification/r5_knn --test_size 16 --batch_size 16 \
  --dtype bfloat16 2>&1 | tail -2

# ---- r5: serving-export on-chip validation ----
timeout 1800 python - <<'PYEOF' 2>&1 | grep -v WARNING | tail -8
import numpy as np, jax, jax.numpy as jnp, tempfile, os
from mm3d_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from mm3d_tpu import ops
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
with ops.use_impl("jax"):
    exp = inference.export_serving(pred, (pts,))
p1 = os.path.join(tmp, "xla.shlo"); inference.save_serving(p1, exp)
o1 = inference.load_serving(p1)(pts)
print("xla artifact on tpu:", o1.shape, "max|d| vs live:",
      float(jnp.abs(o1 - pred(pts)).max()))
with ops.use_impl("pallas"):
    exp2 = inference.export_serving(pred, (pts,), allow_tpu_kernels=True)
p2 = os.path.join(tmp, "pallas.shlo"); inference.save_serving(p2, exp2)
o2 = inference.load_serving(p2)(pts)
print("mosaic artifact on tpu:", o2.shape, "max|d| vs xla artifact:",
      float(jnp.abs(o2 - o1).max()))
PYEOF

# ---- r5: service-level serving bench (live vs artifact vs HTTP) ----
timeout 1800 python scripts/bench_serving.py --impl pallas 2>&1 | tail -1
timeout 1800 python scripts/bench_serving.py --impl jax 2>&1 | tail -1

# ---- r5: serving daemon on-chip smoke ----
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
    base = re.search(r"http://127\.0\.0\.1:\d+", proc.stdout.readline()).group(0)
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

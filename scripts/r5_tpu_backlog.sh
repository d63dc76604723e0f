#!/bin/bash
# Round-5 on-chip backlog.  The r4 backlog (itself containing the r3
# validation) is STILL first — it is now three rounds of driver-verified
# evidence queued behind the axon relay outage (VERDICT r4 item 1).
# Run when the TPU returns:  bash scripts/r5_tpu_backlog.sh
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

# ---- r3+r4 debt, strictly first ----
bash scripts/r4_tpu_backlog.sh

# ---- r5: given-idx fused SA tail (kNN serving) compiled parity ----
# (run_tpu_checks.py now includes the fused_sa_idx check; re-run is in
# the r3 script, so just race the kNN serving path here)
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
pre = jnp.asarray(r.randn(B, N, C1).astype(np.float32))
cb = jnp.asarray(r.randn(B, S, C1).astype(np.float32))
w1 = jnp.asarray(r.randn(C1, C2).astype(np.float32) * .2)
b1 = jnp.asarray(r.randn(C2).astype(np.float32))
w2 = jnp.asarray(r.randn(C2, C3).astype(np.float32) * .2)
b2 = jnp.asarray(r.randn(C3).astype(np.float32))

def unfused(p):
    i = G.knn_point(K, xyz, new)
    g = G.index_points(p, i)
    h = jax.nn.relu(g + cb[:, :, None, :])
    h = jax.nn.relu(h @ w1 + b1)
    h = jax.nn.relu(h @ w2 + b2)
    return p + 1e-9 * jnp.max(h, axis=2).mean()

def fused(p):
    i = G.knn_point(K, xyz, new)
    o = pk.fused_sa_idx_pallas(K, i, p, cb, w1, b1, w2, b2)
    return p + 1e-9 * o.mean()

for name, fn in (("unfused", unfused), ("fused_idx", fused)):
    for dt in (jnp.float32, jnp.bfloat16):
        args = pre.astype(dt)
        t = np.median([chain_time(jax.jit(fn), args) for _ in range(3)]) * 1e3
        print(f"knn SA1-tail {name} {jnp.dtype(dt).name}: {t:.3f} ms")
EOF

# ---- r5: knn model serving smoke (auto now routes fused_sa_idx) ----
timeout 900 python train.py --model pointnet2_cls_knn --epoch 1 --batch_size 16 \
  --train_size 32 --test_size 16 --bn_momentum 0.5 --no_checkpoint \
  --run_name r5_knn 2>&1 | grep final:

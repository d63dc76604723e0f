"""Round-5 loose end: the kNN given-idx fused-SA tail race at the two
pointnet2_cls_knn SA shapes.

Ordering is decision-value-first: the `_want_fused_sa` gate routes
fused_sa_idx ONLY in bf16 serving or explicit --impl pallas mode, so the
bf16 numbers decide the production default — they run first (cold Pallas
chain compiles through the remote tunnel cost ~10-20 min EACH and do not
appear to persistent-cache-hit across processes, so budget goes to the
decisive lines).  fp32 runs last and only at SA2 (SA1 fp32 is already
measured: fused 2.978 vs unfused 1.236 ms, log/r5_loose_ends.log — fused
LOSES 2.4x).
"""
import numpy as np
import jax
import jax.numpy as jnp

from mm3d_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from mm3d_tpu.utils.profiling import chain_time
from mm3d_tpu.ops import geometry as G, pallas_kernels as pk

SHAPES = {
    # name: (B, N, S, K, C1, C2, C3) — pointnet2_cls_knn SA tails
    "SA1": (24, 1024, 512, 32, 64, 64, 128),
    "SA2": (24, 512, 128, 64, 128, 128, 256),
}
# decision-value order: bf16 first (the serving default), fp32-SA2 last
GRID = [("SA1", jnp.bfloat16), ("SA2", jnp.bfloat16),
        ("SA2", jnp.float32)]

for name, dt in GRID:
    B, N, S, K, C1, C2, C3 = SHAPES[name]
    r = np.random.RandomState(0)
    xyz = jnp.asarray(r.randn(B, N, 3).astype(np.float32) * 0.5)
    new = G.index_points(xyz, G.farthest_point_sample(xyz, S))
    pre0 = jnp.asarray(r.randn(B, N, C1).astype(np.float32))
    cb = jnp.asarray(r.randn(B, S, C1).astype(np.float32)).astype(dt)
    w1 = jnp.asarray(r.randn(C1, C2).astype(np.float32) * .2).astype(dt)
    b1 = jnp.asarray(r.randn(C2).astype(np.float32)).astype(dt)
    w2 = jnp.asarray(r.randn(C2, C3).astype(np.float32) * .2).astype(dt)
    b2 = jnp.asarray(r.randn(C3).astype(np.float32)).astype(dt)

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

    pre_d = pre0.astype(dt)
    ts = {}
    for nm, fn in (("unfused", unfused), ("fused_idx", fused)):
        ts[nm] = np.median([chain_time(jax.jit(fn), pre_d)
                            for _ in range(3)]) * 1e3
        print(f"knn {name}-tail {nm} {jnp.dtype(dt).name}: "
              f"{ts[nm]:.3f} ms", flush=True)
    print(f"knn {name} {jnp.dtype(dt).name}: unfused/fused = "
          f"{ts['unfused'] / ts['fused_idx']:.2f}x "
          f"({'fused WINS' if ts['fused_idx'] < ts['unfused'] else 'fused LOSES'})",
          flush=True)

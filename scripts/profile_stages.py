#!/usr/bin/env python
"""Per-stage roofline profile of the flagship forward + train step.

Measures each hot stage of the bench workload (fusion_cls, B=64, N=1024,
bf16 serving) with the chain-slope method (this host's
`block_until_ready` returns early — see utils/profiling.chain_time), and
prints measured ms next to analytic FLOPs / bytes-moved so kernel work
chases measured bytes, not vibes (VERDICT r1 item 8).

Run on the real TPU:  python scripts/profile_stages.py
Optional: MM3D_PROFILE_DTYPE=float32 for the strict-parity mode.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mm3d_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from mm3d_tpu import ops
from mm3d_tpu.utils.profiling import chain_time

B, N, S1, K1c, S2, K2c = 64, 1024, 512, 32, 128, 64
HW = (64, 64)
DTYPE = jnp.bfloat16 if os.environ.get(
    "MM3D_PROFILE_DTYPE", "bfloat16") == "bfloat16" else jnp.float32
DSIZE = 2 if DTYPE == jnp.bfloat16 else 4

# v5e single-chip speeds of light (for the bound column)
HBM_GBS = 819.0
MXU_TFLOPS = 197.0 if DTYPE == jnp.bfloat16 else 49.0


def gb(x):
    return x / 1e9


def run(name, fn, carry, *rest, flops=0.0, bytes_moved=0.0, k1=5, k2=25):
    sec = chain_time(fn, carry, *rest, k1=k1, k2=k2)
    ms = sec * 1e3
    t_mem = bytes_moved / (HBM_GBS * 1e9) * 1e3
    t_flop = flops / (MXU_TFLOPS * 1e12) * 1e3
    bound = "bandwidth" if t_mem >= t_flop else "compute"
    sol = max(t_mem, t_flop)
    rows.append({
        "stage": name, "ms": round(ms, 3),
        "gflop": round(flops / 1e9, 1), "gb_moved": round(gb(bytes_moved), 3),
        "sol_ms": round(sol, 3), "bound": bound,
        "pct_of_sol": round(100 * sol / ms, 1) if ms > 0 else 0.0,
    })
    print(f"{name:28s} {ms:8.3f} ms   {flops/1e9:8.1f} GF "
          f"{gb(bytes_moved):7.3f} GB   SoL {sol:7.3f} ms ({bound})",
          flush=True)


rows = []


def main():
    r = np.random.RandomState(0)
    xyz = jnp.asarray(r.randn(B, N, 3).astype(np.float32))

    # ---------------- FPS ----------------
    def fps1(x):
        return ops.farthest_point_sample(x, S1).astype(jnp.float32)

    run("fps1 (1024->512)", fps1, xyz,
        flops=2.0 * B * N * 3 * S1,
        bytes_moved=B * N * 3 * 4 + B * S1 * 4)

    fidx = ops.farthest_point_sample(xyz, S1)
    new_xyz = ops.index_points(xyz, fidx)

    # ---------------- ball query ----------------
    def bq1(nx):
        return ops.query_ball_point(0.2, K1c, xyz, nx).astype(jnp.float32)

    run("bq1 (S=512,K=32,N=1024)", bq1, new_xyz,
        flops=2.0 * B * S1 * N * 3,
        bytes_moved=B * (N * 3 + S1 * 3 + S1 * K1c) * 4)

    idx1 = ops.query_ball_point(0.2, K1c, xyz, new_xyz)

    # ---------------- SA1 gather+MLP+max (project_first tail) ------------
    C1, C2, C3 = 64, 64, 128
    pre = jnp.asarray(r.randn(B, N, C1).astype(np.float32)).astype(DTYPE)
    w1 = jnp.asarray(r.randn(C1, C2).astype(np.float32) * 0.1).astype(DTYPE)
    w2 = jnp.asarray(r.randn(C2, C3).astype(np.float32) * 0.1).astype(DTYPE)
    cterm = jnp.asarray(r.randn(B, S1, C1).astype(np.float32)).astype(DTYPE)

    def sa1_tail(p):
        g = ops.index_points(p, idx1)             # [B,S,K,C1]
        h = jax.nn.relu(g - cterm[:, :, None, :])
        h = jax.nn.relu(h @ w1)
        h = jax.nn.relu(h @ w2)
        return jnp.max(h, axis=2).astype(jnp.float32)

    flops_sa1 = 2.0 * B * S1 * K1c * (C1 * C2 + C2 * C3)
    # XLA path materializes grouped [B,S,K,C] between matmuls:
    bytes_sa1 = DSIZE * B * (N * C1 + S1 * K1c * (C1 + C1 + C2 + C3)
                             + S1 * C3)
    run("sa1 gather+MLP+max", sa1_tail, pre,
        flops=flops_sa1, bytes_moved=bytes_sa1)

    # ---------------- SA2 ----------------
    xyz2 = new_xyz
    fidx2 = ops.farthest_point_sample(xyz2, S2)
    nxyz2 = ops.index_points(xyz2, fidx2)

    def fps2(x):
        return ops.farthest_point_sample(x, S2).astype(jnp.float32)

    run("fps2 (512->128)", fps2, xyz2,
        flops=2.0 * B * S1 * 3 * S2,
        bytes_moved=B * S1 * 3 * 4 + B * S2 * 4)

    def bq2(nx):
        return ops.query_ball_point(0.4, K2c, xyz2, nx).astype(jnp.float32)

    run("bq2 (S=128,K=64,N=512)", bq2, nxyz2,
        flops=2.0 * B * S2 * S1 * 3,
        bytes_moved=B * (S1 * 3 + S2 * 3 + S2 * K2c) * 4)

    idx2 = ops.query_ball_point(0.4, K2c, xyz2, nxyz2)
    D1, D2, D3 = 128, 128, 256
    pre2 = jnp.asarray(r.randn(B, S1, D1).astype(np.float32)).astype(DTYPE)
    v1 = jnp.asarray(r.randn(D1, D2).astype(np.float32) * 0.1).astype(DTYPE)
    v2 = jnp.asarray(r.randn(D2, D3).astype(np.float32) * 0.1).astype(DTYPE)
    cterm2 = jnp.asarray(r.randn(B, S2, D1).astype(np.float32)).astype(DTYPE)

    def sa2_tail(p):
        g = ops.index_points(p, idx2)
        h = jax.nn.relu(g - cterm2[:, :, None, :])
        h = jax.nn.relu(h @ v1)
        h = jax.nn.relu(h @ v2)
        return jnp.max(h, axis=2).astype(jnp.float32)

    run("sa2 gather+MLP+max", sa2_tail, pre2,
        flops=2.0 * B * S2 * K2c * (D1 * D2 + D2 * D3),
        bytes_moved=DSIZE * B * (S1 * D1 + S2 * K2c * (D1 + D1 + D2 + D3)
                                 + S2 * D3))

    # ---------------- SA3 group-all MLP ----------------
    f2 = jnp.asarray(r.randn(B, S2, D3 + 3).astype(np.float32)).astype(DTYPE)
    g1 = jnp.asarray(r.randn(D3 + 3, 256).astype(np.float32) * .1).astype(DTYPE)
    g2 = jnp.asarray(r.randn(256, 512).astype(np.float32) * .1).astype(DTYPE)
    g3 = jnp.asarray(r.randn(512, 1024).astype(np.float32) * .1).astype(DTYPE)

    def sa3(f):
        h = jax.nn.relu(f @ g1)
        h = jax.nn.relu(h @ g2)
        h = jax.nn.relu(h @ g3)
        return jnp.max(h, axis=1).astype(jnp.float32)

    run("sa3 group-all MLP", sa3, f2,
        flops=2.0 * B * S2 * ((D3 + 3) * 256 + 256 * 512 + 512 * 1024),
        bytes_moved=DSIZE * B * S2 * ((D3 + 3) + 256 + 256 + 512 + 512
                                      + 1024) + DSIZE * B * 1024)

    # ---------------- image branch ----------------
    from mm3d_tpu.models.image import ImageEncoder
    img = jnp.asarray(r.rand(B, *HW, 3).astype(np.float32))
    enc = ImageEncoder(dtype=DTYPE if DTYPE == jnp.bfloat16 else None)
    vars_img = jax.jit(lambda x: enc.init(jax.random.PRNGKey(0), x,
                                          train=False))(img)

    def image_fwd(x):
        fmap, gf = enc.apply(vars_img, x.astype(DTYPE), train=False)
        return gf.astype(jnp.float32)

    run("image branch (64x64 CNN)", image_fwd, img,
        flops=0.0, bytes_moved=DSIZE * B * HW[0] * HW[1] * 3)

    # ---------------- projection + bilinear ----------------
    fmap = jnp.asarray(r.randn(B, 16, 16, 128).astype(np.float32)).astype(DTYPE)
    Km = jnp.broadcast_to(jnp.eye(3) * 32, (B, 3, 3)).astype(jnp.float32)
    Rm = jnp.broadcast_to(jnp.eye(3), (B, 3, 3)).astype(jnp.float32)
    tv = jnp.tile(jnp.array([0., 0., 3.], jnp.float32), (B, 1))
    from mm3d_tpu.ops import projection as proj

    def projs(x):
        s, _ = proj.sample_image_features(fmap, x, Km, Rm, tv, HW, stride=4)
        return s.astype(jnp.float32)

    run("projection+bilinear (N=1024)", projs, xyz,
        flops=2.0 * B * N * 9,
        bytes_moved=DSIZE * B * (16 * 16 * 128 + 4 * N * 128 + N * 128))

    # ---------------- full forward ----------------
    from mm3d_tpu.models import get_model
    spec = get_model("fusion_cls")
    model = spec.builder(num_class=40,
                         dtype=DTYPE if DTYPE == jnp.bfloat16 else None)
    variables = jax.jit(
        lambda *a: model.init({"params": jax.random.PRNGKey(0),
                               "dropout": jax.random.PRNGKey(1)},
                              *a, train=True))(xyz, img, Km, Rm, tv)

    def full(x):
        lp, _ = model.apply(variables, x, img, Km, Rm, tv, train=False)
        return lp

    run("FULL fusion forward", full, xyz)

    # ---------------- training step breakdown (pn2_cls_ssg) -------------
    spec2 = get_model("pointnet2_cls_ssg")
    model2 = spec2.builder(num_class=40)
    labels = jnp.asarray(r.randint(0, 40, (B,)).astype(np.int32))
    vars2 = jax.jit(
        lambda p: model2.init({"params": jax.random.PRNGKey(0),
                               "dropout": jax.random.PRNGKey(1)},
                              p, train=True))(xyz)

    def fwd_only(x):
        lp, aux = model2.apply(vars2, x, train=False)
        return spec2.loss(lp, labels, aux)[None]

    run("train: eval-mode fwd+loss", fwd_only, xyz)

    params = vars2["params"]
    bs = vars2.get("batch_stats", {})

    def loss_of(p, x):
        out = model2.apply(
            {"params": p, "batch_stats": bs} if bs else {"params": p},
            x, train=True, rngs={"dropout": jax.random.PRNGKey(2)},
            mutable=["batch_stats"] if bs else [])
        if bs:
            (lp, aux), _ = out
        else:
            lp, aux = out
        return spec2.loss(lp, labels, aux)

    def train_fwd(x):
        return loss_of(params, x)[None]

    run("train: train-mode fwd+loss", train_fwd, xyz)

    def train_grad(x):
        l, g = jax.value_and_grad(loss_of)(params, x)
        leaves = jax.tree_util.tree_leaves(g)
        return l[None] + 1e-12 * sum(jnp.sum(a.astype(jnp.float32))
                                     for a in leaves)[None]

    run("train: fwd+bwd (grad)", train_grad, xyz, k1=3, k2=13)

    print()
    print(json.dumps(rows))


if __name__ == "__main__":
    main()

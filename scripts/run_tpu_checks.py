#!/usr/bin/env python
"""Real-TPU correctness checks (run manually / by CI on a TPU host).

The pytest suite pins the CPU backend for determinism; this script
exercises the Pallas kernels and the end-to-end forward on the real
chip and compares against the torch-CPU oracle:
  python scripts/run_tpu_checks.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from mm3d_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import torch

    import mm3d_tpu.ops as ops
    from mm3d_tpu.ops import pallas_kernels as pk
    from oracle import torch_ops as tops

    assert jax.default_backend() in ("tpu", "axon"), jax.default_backend()
    failures = []

    B, N, S, NP, r, K = 16, 1024, 512, 512, 0.2, 32
    xyz = jnp.asarray(np.random.RandomState(0).randn(B, N, 3).astype(np.float32))
    txyz = torch.from_numpy(np.array(xyz))

    got = np.asarray(jax.jit(lambda p: pk.fps_pallas(p, NP))(xyz))
    want = tops.farthest_point_sample(txyz, NP).numpy()
    ok = (got == want).all()
    print(f"fps_pallas == torch oracle: {bool(ok)}")
    if not ok:
        failures.append("fps")

    new = xyz[:, :S]
    got = np.asarray(jax.jit(
        lambda a, b: pk.ball_query_pallas(r, K, a, b))(xyz, new))
    want = tops.query_ball_point(r, K, txyz, torch.from_numpy(np.array(new))).numpy()
    ok = (got == want).all()
    print(f"ball_query_pallas == torch oracle: {bool(ok)}")
    if not ok:
        failures.append("ball_query")

    got = np.asarray(jax.jit(
        lambda a, b: pk.ball_query_v2_pallas(r, K, a, b))(xyz, new))
    ok = (got == want).all()
    print(f"ball_query_v2_pallas (default kernel) == torch oracle: "
          f"{bool(ok)}")
    if not ok:
        failures.append("ball_query_v2")

    # gather backward (training path): pallas one-hot-transpose matmul
    # vs explicit scatter-add on-chip
    from mm3d_tpu.ops import geometry as G
    idxg = jnp.asarray(got[:, :S].astype(np.int32))
    gco = jnp.asarray(np.random.RandomState(3).randn(
        B, S, K, 64).astype(np.float32))
    gp = np.asarray(jax.jit(
        lambda g: pk.gather_bwd_pallas(g, idxg, N))(gco))
    flat = np.zeros((B * N, 64), np.float32)
    offs = (np.arange(B) * N).reshape(B, 1, 1)
    np.add.at(flat, np.asarray(idxg + offs).reshape(-1),
              np.asarray(gco).reshape(-1, 64))
    ok = np.allclose(gp, flat.reshape(B, N, 64), rtol=1e-5, atol=1e-4)
    print(f"gather_bwd_pallas == scatter-add on TPU: {bool(ok)}")
    if not ok:
        failures.append("gather_bwd")

    dense = xyz
    sparse = xyz[:, :128]
    gd, gi = np.asarray(jax.jit(pk.three_nn_pallas)(dense, sparse)[0]), \
        np.asarray(jax.jit(pk.three_nn_pallas)(dense, sparse)[1])
    wd, wi = tops.three_nn(txyz, torch.from_numpy(np.array(sparse)))
    ok = (gi == wi.numpy()).all() and np.allclose(
        gd, wd.numpy(), rtol=1e-4, atol=1e-5)
    print(f"three_nn_pallas == torch oracle: {bool(ok)}")
    if not ok:
        failures.append("three_nn")

    # dispatch auto mode picks the kernels on TPU
    with ops.use_impl("auto"):
        idx = np.asarray(jax.jit(
            lambda p: ops.farthest_point_sample(p, NP))(xyz))
    ok = (idx == tops.farthest_point_sample(txyz, NP).numpy()).all()
    print(f"auto-dispatch FPS on TPU == oracle: {bool(ok)}")
    if not ok:
        failures.append("dispatch")

    # fused SA kernel (ball query + gather + MLP + max in one Pallas call)
    # vs the unfused project_first composition, compiled, fp32
    from mm3d_tpu.ops import geometry as G
    rng = np.random.RandomState(7)
    pre = jnp.asarray(rng.randn(B, N, 64).astype(np.float32))
    cb = jnp.asarray(rng.randn(B, S, 64).astype(np.float32))
    w1 = jnp.asarray(rng.randn(64, 64).astype(np.float32) * .2)
    b1 = jnp.asarray(rng.randn(64).astype(np.float32))
    w2 = jnp.asarray(rng.randn(64, 128).astype(np.float32) * .2)
    b2 = jnp.asarray(rng.randn(128).astype(np.float32))
    new = xyz[:, :S]

    def unfused(p):
        i2 = pk.ball_query_pallas(r, K, xyz, new)
        g = G.index_points(p, i2)
        h = jax.nn.relu(g + cb[:, :, None, :])
        h = jax.nn.relu(h @ w1 + b1)
        h = jax.nn.relu(h @ w2 + b2)
        return jnp.max(h, axis=2)

    # pin the XLA reference to true-f32 matmuls: the kernel runs its f32
    # dots at HIGHEST, while XLA's TPU default is bf16 passes (~1e-3 rel)
    with jax.default_matmul_precision("highest"):
        want_f = np.asarray(jax.jit(unfused)(pre))
    got_f = np.asarray(jax.jit(
        lambda p: pk.fused_sa_pallas(r, K, xyz, new, p, cb,
                                     w1, b1, w2, b2))(pre))
    ok = np.allclose(got_f, want_f, rtol=1e-5, atol=1e-4)
    print(f"fused_sa_pallas == unfused composition (fp32): {bool(ok)} "
          f"(maxdiff {np.abs(got_f - want_f).max():.3g})")
    if not ok:
        failures.append("fused_sa")

    # given-idx fused SA tail (kNN serving, r5) vs the unfused knn
    # composition, compiled, fp32
    def unfused_knn(p):
        i2 = G.knn_point(K, xyz, new)
        g = G.index_points(p, i2)
        h = jax.nn.relu(g + cb[:, :, None, :])
        h = jax.nn.relu(h @ w1 + b1)
        h = jax.nn.relu(h @ w2 + b2)
        return jnp.max(h, axis=2)

    with jax.default_matmul_precision("highest"):
        want_k = np.asarray(jax.jit(unfused_knn)(pre))
    got_k = np.asarray(jax.jit(
        lambda p: pk.fused_sa_idx_pallas(K, G.knn_point(K, xyz, new),
                                         p, cb, w1, b1, w2, b2))(pre))
    ok = np.allclose(got_k, want_k, rtol=1e-5, atol=1e-4)
    print(f"fused_sa_idx_pallas == unfused knn composition (fp32): "
          f"{bool(ok)} (maxdiff {np.abs(got_k - want_k).max():.3g})")
    if not ok:
        failures.append("fused_sa_idx")

    # fused FP-tail kernel (three_nn + inverse-distance interp + skip +
    # relu in one Pallas call) vs the op composition, compiled, fp32
    x1 = jnp.asarray(rng.randn(4, 1024, 3).astype(np.float32))
    x2 = x1[:, :256]
    prefp = jnp.asarray(rng.randn(4, 256, 128).astype(np.float32))
    skfp = jnp.asarray(rng.randn(4, 1024, 128).astype(np.float32))

    def fp_comp(p):
        d, i3 = ops.three_nn(x1, x2)
        w = G.interpolation_weights(d)
        return jax.nn.relu(ops.three_interpolate(p, i3, w) + skfp)

    want_fp = np.asarray(jax.jit(fp_comp)(prefp))
    got_fp = np.asarray(jax.jit(
        lambda p: pk.fused_fp_pallas(x1, x2, p, skfp))(prefp))
    ok = np.allclose(got_fp, want_fp, rtol=1e-5, atol=1e-4)
    print(f"fused_fp_pallas == op composition (fp32): {bool(ok)} "
          f"(maxdiff {np.abs(got_fp - want_fp).max():.3g})")
    if not ok:
        failures.append("fused_fp")

    # full-model eval logits: fused Pallas path vs pure-JAX path on TPU
    from mm3d_tpu.models import get_model
    spec = get_model("pointnet2_cls_ssg")
    model = spec.builder(num_class=10)
    pts = jnp.asarray(rng.randn(8, 1024, 3).astype(np.float32) * 0.5)
    variables = jax.jit(
        lambda p: model.init({"params": jax.random.PRNGKey(0),
                              "dropout": jax.random.PRNGKey(1)},
                             p, train=True))(pts)
    with ops.use_impl("jax"):
        lp_jax, _ = jax.jit(
            lambda v, p: model.apply(v, p, train=False))(variables, pts)
    with ops.use_impl("auto"):
        lp_pal, _ = jax.jit(
            lambda v, p: model.apply(v, p, train=False))(variables, pts)
    d = np.abs(np.asarray(lp_jax) - np.asarray(lp_pal)).max()
    ok = d < 1e-3
    print(f"pn2_cls_ssg eval logits pallas-vs-jax on TPU: {bool(ok)} "
          f"(maxdiff {d:.3g})")
    if not ok:
        failures.append("model_fused_logits")

    # semseg eval logits on TPU: auto (fused SA + fused FP) vs pure JAX
    # — fp32 auto now routes the FP tail through the Pallas kernel, so
    # the on-chip quality gate must cover a per-point FP-path model too
    spec = get_model("pointnet2_sem_seg")
    smodel = spec.builder(num_class=13)
    spts = jnp.asarray(rng.randn(2, 1024, 9).astype(np.float32) * 0.5)
    svars = jax.jit(
        lambda p: smodel.init({"params": jax.random.PRNGKey(0),
                               "dropout": jax.random.PRNGKey(1)},
                              p, train=True))(spts)
    with ops.use_impl("jax"):
        sl_jax, _ = jax.jit(
            lambda v, p: smodel.apply(v, p, train=False))(svars, spts)
    with ops.use_impl("auto"):
        sl_pal, _ = jax.jit(
            lambda v, p: smodel.apply(v, p, train=False))(svars, spts)
    d = np.abs(np.asarray(sl_jax) - np.asarray(sl_pal)).max()
    ok = d < 1e-3
    print(f"pn2_sem_seg eval logits (fused SA+FP) auto-vs-jax on TPU: "
          f"{bool(ok)} (maxdiff {d:.3g})")
    if not ok:
        failures.append("semseg_fused_logits")

    if failures:
        print("FAILED:", failures)
        sys.exit(1)
    print("ALL TPU CHECKS PASSED")


if __name__ == "__main__":
    main()

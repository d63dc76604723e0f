"""Train-mode fused SA path == unfused XLA path (VERDICT r1 item 3).

The train-mode fusion streams BN batch statistics and runs the whole SA
tail as folded-affine Pallas passes with an exact BN-train custom VJP.

Comparison levels (chosen deliberately):
- `_sa_train_cv` vs a hand-written unfused reference: tight (1e-5-grade)
  — this is the kernel+VJP correctness gate, including duplicate-heavy
  ball-query padding and zero-hit centroids.
- SetAbstraction module, fused vs unfused impl: 1e-3-grade (the two
  paths associate fp ops differently; near-tie max winners may flip).
- Whole-model train step: loss agreement at 5e-3 and finiteness only —
  2-sample head BatchNorms amplify benign 1e-4 activation differences
  ~100x, so elementwise gradient comparison is not meaningful there
  (the torch-oracle grad-parity suite remains the model-level gate).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mm3d_tpu import ops
from mm3d_tpu.models import get_model
from mm3d_tpu.models.pointnet2 import SetAbstraction
from mm3d_tpu.ops import geometry as G
from mm3d_tpu.ops.sa_train_kernels import _sa_train_cv, _Static

EPS = 1e-5


def _bn_train(x, g, b):
    m = jnp.mean(x, (0, 1, 2))
    v = jnp.maximum(jnp.mean(x * x, (0, 1, 2)) - m * m, 0.0)
    return (x - m) * jax.lax.rsqrt(v + EPS) * g + b, (m, v)


def _mk(seed, B, N, S, K, C1, C2, C3, radius, zero_hit=False):
    r = np.random.RandomState(seed)
    xyz = jnp.asarray(r.randn(B, N, 3).astype(np.float32) * 0.5)
    new = G.index_points(xyz, G.farthest_point_sample(xyz, S))
    if zero_hit:
        new = new.at[:, 2].set(100.0)
    idx = G.query_ball_point(radius, K, xyz, new)
    args = dict(
        pre=jnp.asarray(r.randn(B, N, C1).astype(np.float32)),
        cb=jnp.asarray(r.randn(B, S, C1).astype(np.float32)),
        k1=jnp.asarray(r.randn(C1, C2).astype(np.float32) * .4),
        b1d=jnp.asarray(r.randn(C2).astype(np.float32) * .2),
        k2=jnp.asarray(r.randn(C2, C3).astype(np.float32) * .4),
        b2d=jnp.asarray(r.randn(C3).astype(np.float32) * .2),
        g0=jnp.asarray(1 + .1 * r.randn(C1).astype(np.float32)),
        be0=jnp.asarray(.1 * r.randn(C1).astype(np.float32)),
        g1=jnp.asarray(1 + .1 * r.randn(C2).astype(np.float32)),
        be1=jnp.asarray(.1 * r.randn(C2).astype(np.float32)),
        g2=jnp.asarray(1 + .1 * r.randn(C3).astype(np.float32)),
        be2=jnp.asarray(.1 * r.randn(C3).astype(np.float32)),
    )
    co = jnp.asarray(r.randn(B, S, C3).astype(np.float32))
    return idx, args, co


@pytest.mark.parametrize("B,N,S,K,radius,zero_hit", [
    pytest.param(2, 96, 24, 16, 0.4, True,     # unaligned + zero-hit
                 marks=pytest.mark.slow),
    pytest.param(2, 128, 64, 32, 0.2, False,   # duplicate-heavy padding
                 marks=pytest.mark.slow),
])
# both cases slow-marked (r5): the train-fused path ships gated off with
# its fate pending the on-chip roofline closure (VERDICT r4 item 6) and
# this custom-VJP jit was the single most expensive suite item (28 s);
# run with --slow (and always before any retrofit race)
def test_sa_train_cv_matches_reference(B, N, S, K, radius, zero_hit):
    idx, args, co = _mk(0, B, N, S, K, 12, 16, 24, radius, zero_hit)
    names = list(args)

    def ref(*a):
        d = dict(zip(names, a))
        gth = G._index_points_impl(d["pre"], idx)
        h0 = gth + d["cb"][:, :, None, :]
        y0, s0 = _bn_train(h0, d["g0"], d["be0"])
        a1 = jax.nn.relu(y0)
        y1, s1 = _bn_train(a1 @ d["k1"] + d["b1d"], d["g1"], d["be1"])
        a2 = jax.nn.relu(y1)
        y2, s2 = _bn_train(a2 @ d["k2"] + d["b2d"], d["g2"], d["be2"])
        return jnp.max(jax.nn.relu(y2), axis=2), (s0, s1, s2)

    st = _Static(EPS, True)

    def fused(*a):
        return _sa_train_cv(idx, *a, st)

    with jax.default_matmul_precision("highest"):
        out_r, stats_r = ref(*args.values())
        out_f, stats_f = fused(*args.values())
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r),
                                   rtol=1e-4, atol=1e-4)
        for sr, sf in zip(stats_r, stats_f):
            np.testing.assert_allclose(np.asarray(sf[0]), np.asarray(sr[0]),
                                       atol=1e-4)
            np.testing.assert_allclose(np.asarray(sf[1]), np.asarray(sr[1]),
                                       atol=1e-4)

        gr = jax.grad(lambda *a: jnp.sum(ref(*a)[0] * co),
                      argnums=tuple(range(12)))(*args.values())
        gf = jax.grad(lambda *a: jnp.sum(fused(*a)[0] * co),
                      argnums=tuple(range(12)))(*args.values())
    for n, a, b in zip(names, gr, gf):
        if n in ("b1d", "b2d"):
            # analytically zero (BN subtracts the batch mean, so the
            # dense bias cancels; verified exactly in f64).  In f32 both
            # paths produce noise amplified by near-zero-variance
            # (dead-relu) channels' 1/sqrt(eps) — just bound it.
            assert np.abs(np.asarray(a)).max() < 5e-2
            assert np.abs(np.asarray(b)).max() < 5e-2
            continue
        sc = np.abs(np.asarray(a)).max() + 1e-2
        np.testing.assert_allclose(np.asarray(b) / sc, np.asarray(a) / sc,
                                   atol=2e-3, err_msg=f"grad {n}")


@pytest.mark.slow  # dormant negative-result path (VERDICT r2 item 10)
def test_setabstraction_module_fused_vs_unfused():
    model = SetAbstraction(16, 0.4, 8, (16, 16, 32))
    r = np.random.RandomState(1)
    xyz = jnp.asarray(r.randn(2, 96, 3).astype(np.float32) * 0.5)
    with ops.use_impl("jax"):
        variables = model.init(jax.random.PRNGKey(0), xyz, None, train=True)
    co = jnp.asarray(r.randn(2, 16, 32).astype(np.float32))

    def loss(params, impl):
        with ops.use_impl(impl):
            (new_xyz, out), mut = model.apply(
                {"params": params,
                 "batch_stats": variables["batch_stats"]},
                xyz, None, train=True, mutable=["batch_stats"])
        return jnp.sum(out * co), mut["batch_stats"]

    with jax.default_matmul_precision("highest"):
        (l_r, bs_r), g_r = jax.value_and_grad(
            loss, has_aux=True)(variables["params"], "jax")
        (l_f, bs_f), g_f = jax.value_and_grad(
            loss, has_aux=True)(variables["params"], "pallas")
    np.testing.assert_allclose(float(l_f), float(l_r), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(bs_r),
                    jax.tree_util.tree_leaves(bs_f)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-4)
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(g_r)[0],
            jax.tree_util.tree_flatten_with_path(g_f)[0]):
        key = jax.tree_util.keystr(pa)
        if ("dense_" in key and "bias" in key) or "proj_bias" in key:
            # pre-BN additive biases: gradient is analytically zero
            # (BN subtracts the batch mean); f32 residue on both sides
            # is dead-channel-amplified noise — bound, don't compare
            assert np.abs(np.asarray(a)).max() < 5e-2, key
            assert np.abs(np.asarray(b)).max() < 5e-2, key
            continue
        sc = np.abs(np.asarray(a)).max() + 1e-2
        np.testing.assert_allclose(np.asarray(b) / sc, np.asarray(a) / sc,
                                   atol=2e-3, err_msg=key)


@pytest.mark.slow  # the train-fused path is a recorded negative result
# (FLOP-bound slower than unfused XLA, gated off in auto mode —
# BASELINE.md r2); keep its whole-model gradient check out of the
# default suite, run with --slow
def test_model_train_fused_smoke():
    spec = get_model("pointnet2_cls_ssg")
    model = spec.builder(num_class=6)
    r = np.random.RandomState(0)
    pts = jnp.asarray(r.randn(2, 128, 3).astype(np.float32) * 0.5)
    labels = jnp.asarray(np.array([1, 4], np.int32))
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1)}
    with ops.use_impl("jax"):
        variables = model.init(rngs, pts, train=True)

    def loss_fn(params, impl):
        with ops.use_impl(impl):
            (logp, aux), mut = model.apply(
                {"params": params,
                 "batch_stats": variables["batch_stats"]}, pts,
                train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(2)})
        return spec.loss(logp, labels, aux)

    with jax.default_matmul_precision("highest"):
        l_r, g_r = jax.value_and_grad(loss_fn)(variables["params"], "jax")
        l_f, g_f = jax.value_and_grad(loss_fn)(variables["params"],
                                               "pallas")
    np.testing.assert_allclose(float(l_f), float(l_r), rtol=5e-3)
    for g in jax.tree_util.tree_leaves(g_f):
        assert np.isfinite(np.asarray(g)).all()

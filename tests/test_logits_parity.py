"""Quality gate (BASELINE.json:5): eval-mode log-probabilities of the JAX
models match the torch-CPU oracle within fp32 tolerance after weight
transfer — including through FPS/ball-query (index-level) paths."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from mm3d_tpu.models import get_model
from oracle import torch_models as tm
from _helpers import jit_init


def _trained_variables(model, args, nsteps=3):
    """Init + a few train-mode passes so BN stats are non-trivial."""
    v = jit_init(model, {"params": jax.random.PRNGKey(0),
                         "dropout": jax.random.PRNGKey(1)}, *args,
                 train=True)
    params, bs = v["params"], v["batch_stats"]
    warm = jax.jit(lambda p, b, i: model.apply(
        {"params": p, "batch_stats": b}, *args, train=True,
        rngs={"dropout": jax.random.fold_in(jax.random.PRNGKey(2), i)},
        mutable=["batch_stats"]))
    for i in range(nsteps):
        _, mut = warm(params, bs, i)
        bs = mut["batch_stats"]
    return {"params": params, "batch_stats": bs}


def test_pointnet_cls_logits_match_torch():
    spec = get_model("pointnet_cls")
    model = spec.builder(num_class=7)
    pts = jnp.asarray(np.random.RandomState(0).randn(2, 128, 3).astype(np.float32))
    variables = _trained_variables(model, (pts,))
    with jax.default_matmul_precision("float32"):
        logp_jax, _ = jax.jit(lambda v: model.apply(
            v, pts, train=False))(variables)

    oracle = tm.PointNetCls(num_class=7).eval()
    tm.load_pointnet_cls(oracle, variables)
    with torch.no_grad():
        logp_t, _ = oracle(torch.from_numpy(np.asarray(pts)))
    np.testing.assert_allclose(
        np.asarray(logp_jax), logp_t.numpy(), rtol=1e-4, atol=1e-4)


def test_pointnet2_cls_msg_logits_match_torch():
    spec = get_model("pointnet2_cls_msg")
    model = spec.builder(num_class=5)
    pts = jnp.asarray(np.random.RandomState(2).randn(2, 256, 3).astype(np.float32))
    variables = _trained_variables(model, (pts,), nsteps=2)
    with jax.default_matmul_precision("float32"):
        logp_jax, _ = jax.jit(lambda v: model.apply(
            v, pts, train=False))(variables)

    oracle = tm.PointNet2ClsMSG(num_class=5).eval()
    tm.load_pointnet2_cls_msg(oracle, variables)
    with torch.no_grad():
        logp_t, _ = oracle(torch.from_numpy(np.asarray(pts)))
    np.testing.assert_allclose(
        np.asarray(logp_jax), logp_t.numpy(), rtol=1e-4, atol=1e-4)


def test_pointnet2_part_seg_ssg_logits_match_torch():
    spec = get_model("pointnet2_part_seg_ssg")
    model = spec.builder()
    rng = np.random.RandomState(3)
    pts = jnp.asarray(rng.randn(2, 256, 3).astype(np.float32))
    onehot = jax.nn.one_hot(jnp.array([4, 9]), 16)
    variables = _trained_variables(model, (pts, onehot), nsteps=2)
    with jax.default_matmul_precision("float32"):
        logp_jax, _ = jax.jit(lambda v: model.apply(
            v, pts, onehot, train=False))(variables)

    oracle = tm.PointNet2PartSegSSG().eval()
    tm.load_pointnet2_part_seg_ssg(oracle, variables)
    with torch.no_grad():
        logp_t, _ = oracle(torch.from_numpy(np.asarray(pts)),
                           torch.from_numpy(np.asarray(onehot)))
    # per-point logits within fp32 tolerance (BASELINE.json:5)
    np.testing.assert_allclose(
        np.asarray(logp_jax), logp_t.numpy(), rtol=1e-4, atol=1e-4)


def test_fusion_cls_logits_match_torch():
    """Config 4 quality gate: multimodal fusion logits parity including
    the image CNN (NHWC->NCHW transfer, asymmetric SAME padding)."""
    spec = get_model("fusion_cls")
    model = spec.builder(num_class=6)
    rng = np.random.RandomState(5)
    pts = jnp.asarray(rng.randn(2, 128, 3).astype(np.float32))
    img = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32))
    K = jnp.asarray(np.stack([np.eye(3, dtype=np.float32) * 16] * 2))
    R = jnp.asarray(np.stack([np.eye(3, dtype=np.float32)] * 2))
    t = jnp.asarray(np.array([[0, 0, 3.0]] * 2, np.float32))
    variables = _trained_variables(model, (pts, img, K, R, t), nsteps=2)
    with jax.default_matmul_precision("float32"):
        logp_jax, _ = jax.jit(lambda v: model.apply(
            v, pts, img, K, R, t, train=False))(variables)

    oracle = tm.FusionCls(num_class=6).eval()
    tm.load_fusion_cls(oracle, variables)
    with torch.no_grad():
        logp_t, _ = oracle(torch.from_numpy(np.asarray(pts)),
                           torch.from_numpy(np.asarray(img)))
    np.testing.assert_allclose(
        np.asarray(logp_jax), logp_t.numpy(), rtol=1e-4, atol=1e-4)


def test_fusion_semseg_logits_match_torch():
    """Config 5 quality gate: per-point multimodal semseg logits parity
    including projection + bilinear sampling."""
    spec = get_model("fusion_sem_seg")
    model = spec.builder(num_class=13)
    rng = np.random.RandomState(6)
    pts = jnp.asarray(rng.randn(2, 128, 9).astype(np.float32))
    img = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32))
    K = jnp.asarray(np.stack([np.eye(3, dtype=np.float32) * 16] * 2))
    K = K.at[:, 0, 2].set(16.0).at[:, 1, 2].set(16.0).at[:, 2, 2].set(1.0)
    R = jnp.asarray(np.stack([np.eye(3, dtype=np.float32)] * 2))
    t = jnp.asarray(np.array([[0, 0, 3.0]] * 2, np.float32))
    variables = _trained_variables(model, (pts, img, K, R, t), nsteps=2)
    with jax.default_matmul_precision("float32"):
        logp_jax, _ = jax.jit(lambda v: model.apply(
            v, pts, img, K, R, t, train=False))(variables)

    oracle = tm.FusionSemSeg(num_class=13, in_channels=9).eval()
    tm.load_fusion_semseg(oracle, variables)
    with torch.no_grad():
        logp_t, _ = oracle(torch.from_numpy(np.asarray(pts)),
                           torch.from_numpy(np.asarray(img)),
                           torch.from_numpy(np.asarray(K)),
                           torch.from_numpy(np.asarray(R)),
                           torch.from_numpy(np.asarray(t)))
    np.testing.assert_allclose(
        np.asarray(logp_jax), logp_t.numpy(), rtol=1e-4, atol=1e-4)


def test_pointnet2_cls_ssg_logits_match_torch():
    spec = get_model("pointnet2_cls_ssg")
    model = spec.builder(num_class=5)
    pts = jnp.asarray(np.random.RandomState(1).randn(2, 256, 3).astype(np.float32))
    variables = _trained_variables(model, (pts,))
    with jax.default_matmul_precision("float32"):
        logp_jax, _ = jax.jit(lambda v: model.apply(
            v, pts, train=False))(variables)

    oracle = tm.PointNet2ClsSSG(num_class=5).eval()
    tm.load_pointnet2_cls_ssg(oracle, variables)
    with torch.no_grad():
        logp_t, _ = oracle(torch.from_numpy(np.asarray(pts)))
    np.testing.assert_allclose(
        np.asarray(logp_jax), logp_t.numpy(), rtol=1e-4, atol=1e-4)

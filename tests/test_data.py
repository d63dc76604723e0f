"""Augmentation invariants + synthetic dataset contracts + pipeline."""

import jax
import jax.numpy as jnp
import numpy as np

from mm3d_tpu.data import augment, pipeline
from mm3d_tpu.data import synthetic as syn


def _batch(b=4, n=64, c=3, seed=0):
    return jnp.asarray(np.random.RandomState(seed).randn(b, n, c).astype(np.float32))


def test_rotations_preserve_norms_and_normals():
    x = _batch(c=6)
    key = jax.random.PRNGKey(0)
    for fn in (augment.rotate_point_cloud, augment.rotate_point_cloud_z,
               augment.rotate_perturbation_point_cloud):
        y = fn(key, x, rotate_normals=True)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(y[..., :3]), axis=-1),
            np.linalg.norm(np.asarray(x[..., :3]), axis=-1), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(y[..., 3:6]), axis=-1),
            np.linalg.norm(np.asarray(x[..., 3:6]), axis=-1), rtol=1e-5, atol=1e-5)
        # without rotate_normals the feature channels pass through untouched
        y2 = fn(key, x)
        np.testing.assert_array_equal(np.asarray(y2[..., 3:]), np.asarray(x[..., 3:]))


def test_jitter_bounded_and_scale_range():
    x = _batch()
    key = jax.random.PRNGKey(1)
    y = augment.jitter_point_cloud(key, x, sigma=0.01, clip=0.05)
    assert float(jnp.max(jnp.abs(y - x))) <= 0.05 + 1e-6
    z = augment.random_scale_point_cloud(key, x)
    xa, za = np.asarray(x[..., :3]), np.asarray(z[..., :3])
    scale = za.reshape(4, -1).sum(1) / xa.reshape(4, -1).sum(1)
    np.testing.assert_allclose(za, xa * scale[:, None, None], rtol=1e-4, atol=1e-6)
    assert (scale >= 0.8 - 1e-5).all() and (scale <= 1.25 + 1e-5).all()


def test_dropout_replaces_with_first_point():
    x = _batch(b=2, n=128)
    y = augment.random_point_dropout(jax.random.PRNGKey(3), x, max_dropout_ratio=0.9)
    ya = np.asarray(y); xa = np.asarray(x)
    for b in range(2):
        changed = ~(ya[b] == xa[b]).all(-1)
        assert (ya[b][changed] == ya[b][0]).all()


def test_shuffle_is_permutation():
    x = _batch(b=3, n=32)
    y = augment.shuffle_points(jax.random.PRNGKey(4), x)
    for b in range(3):
        a = np.sort(np.asarray(x[b]), axis=0)
        bb = np.sort(np.asarray(y[b]), axis=0)
        np.testing.assert_array_equal(a, bb)


def test_pc_normalize():
    x = _batch(b=2, n=64, c=6, seed=7) * 5.0 + 2.0
    y = np.asarray(augment.pc_normalize(x))
    np.testing.assert_allclose(y[..., :3].mean(-2), 0.0, atol=1e-5)
    np.testing.assert_allclose(
        np.abs(np.linalg.norm(y[..., :3], axis=-1)).max(-1), 1.0, rtol=1e-5)
    np.testing.assert_array_equal(y[..., 3:], np.asarray(x[..., 3:]))


def test_augment_pipeline_jits():
    x = _batch(b=2, n=64)
    f = jax.jit(lambda k, b: augment.augment_batch(
        k, b, augment.TASK_PIPELINES["classification"]))
    y = f(jax.random.PRNGKey(5), x)
    assert y.shape == x.shape and bool(jnp.isfinite(y).all())


def test_synthetic_modelnet_contract():
    ds = syn.SyntheticModelNet(num_classes=10, npoints=256, normals=True,
                               size=40, seed=3)
    p1, l1 = ds[17]
    p2, l2 = ds[17]
    np.testing.assert_array_equal(p1, p2)  # deterministic in index
    assert p1.shape == (256, 6) and p1.dtype == np.float32
    assert 0 <= l1 < 10 and l1 == l2
    # normalized: inside unit sphere, normals ~unit
    assert np.linalg.norm(p1[:, :3], axis=1).max() <= 1.0 + 1e-5
    nn = np.linalg.norm(p1[:, 3:], axis=1)
    assert (np.abs(nn - 1) < 0.05).mean() > 0.95
    # classes are distinguishable: different classes differ
    q1, _ = ds[0]; q2, _ = ds[1]
    assert np.abs(q1 - q2).max() > 0.1


def test_synthetic_shapenetpart_contract():
    ds = syn.SyntheticShapeNetPart(npoints=512, size=32, seed=1)
    pts, cat, seg = ds[5]
    assert pts.shape == (512, 3) and seg.shape == (512,)
    lo, hi = ds.ranges[cat]
    assert seg.min() >= lo and seg.max() < hi
    assert sum(syn._PARTS_PER_CAT) == 50 and len(syn._PARTS_PER_CAT) == 16


def test_synthetic_scene_contract():
    ds = syn.SyntheticIndoorScene(npoints=1024, size=8, seed=2)
    feats, seg = ds[3]
    assert feats.shape == (1024, 9) and seg.shape == (1024,)
    assert seg.min() >= 0 and seg.max() < 13
    assert feats[:, 3:6].min() >= 0 and feats[:, 3:6].max() <= 1  # rgb


def test_synthetic_multimodal_contract():
    ds = syn.SyntheticMultimodal(
        base=syn.SyntheticModelNet(num_classes=4, npoints=128, size=8),
        hw=(32, 32))
    s = ds[2]
    assert s["points"].shape == (128, 3) and s["image"].shape == (32, 32, 3)
    assert s["K"].shape == (3, 3) and s["R"].shape == (3, 3) and s["t"].shape == (3,)
    assert s["image"][..., 2].sum() > 10  # a meaningful number of pixels hit
    # extrinsics are a valid rotation
    np.testing.assert_allclose(s["R"] @ s["R"].T, np.eye(3), atol=1e-5)


def test_pipeline_batching_and_prefetch():
    ds = syn.SyntheticModelNet(num_classes=4, npoints=64, size=22, seed=0)
    pipe = pipeline.DataPipeline(ds, batch_size=4, shuffle=True, seed=1,
                                 to_device=False)
    assert pipe.steps_per_epoch() == 5  # 22//4, tail dropped
    batches = list(pipe.epoch(0))
    assert len(batches) == 5
    pts, labels = batches[0]
    assert pts.shape == (4, 64, 3) and labels.shape == (4,)
    # deterministic per (seed, epoch)
    again = list(pipeline.DataPipeline(
        ds, batch_size=4, shuffle=True, seed=1, to_device=False).epoch(0))
    np.testing.assert_array_equal(batches[2][0], again[2][0])
    # different epoch order differs
    other = list(pipe.epoch(1))
    assert any(not np.array_equal(a[1], b[1]) for a, b in zip(batches, other))


def test_pipeline_pad_remainder_full_coverage():
    # eval must see the full test set: tail padded + valid mask
    ds = syn.SyntheticModelNet(num_classes=4, npoints=64, size=10, seed=0)
    pipe = pipeline.DataPipeline(ds, batch_size=4, shuffle=False,
                                 to_device=False, pad_remainder=True)
    assert pipe.steps_per_epoch() == 3  # ceil(10/4)
    out = list(pipe.epoch(0))
    assert len(out) == 3
    (pts, labels), valid = out[-1]
    assert pts.shape == (4, 64, 3) and valid.shape == (4,)
    np.testing.assert_array_equal(valid, [True, True, False, False])
    assert all(v.all() for (_, v) in out[:-1])
    # padded rows wrap to the first samples
    first_batch = out[0][0]
    np.testing.assert_array_equal(pts[2], first_batch[0][0])
    np.testing.assert_array_equal(pts[3], first_batch[0][1])


def test_pipeline_error_propagates():
    class Bad:
        def __len__(self):
            return 8
        def __getitem__(self, i):
            if i == 3:
                raise ValueError("boom")
            return np.zeros(3, np.float32)

    pipe = pipeline.DataPipeline(Bad(), batch_size=2, shuffle=False,
                                 to_device=False)
    try:
        list(pipe.epoch(0))
        assert False, "expected ValueError"
    except ValueError as e:
        assert "boom" in str(e)


def test_loaders_resample_per_epoch(tmp_path):
    # the reference protocol draws a fresh subsample per access; our
    # deterministic equivalent varies the crop with set_epoch (epoch 0
    # reproduces the pre-epoch-seeding stream)
    import numpy as np
    import os
    from mm3d_tpu.data.loaders import ShapeNetPartDataset
    root = tmp_path / "shapenet"
    synset = root / "02691156"
    os.makedirs(synset)
    r = np.random.RandomState(0)
    rows = np.concatenate([r.randn(300, 6), r.randint(0, 4, (300, 1))], -1)
    np.savetxt(synset / "x.txt", rows, fmt="%.4f")
    (root / "synsetoffset2category.txt").write_text("airplane\t02691156\n")
    os.makedirs(root / "train_test_split")
    (root / "train_test_split" / "shuffled_train_file_list.json"
     ).write_text('["shape_data/02691156/x"]')
    ds = ShapeNetPartDataset(str(root), split="train", npoints=64)
    ds.set_epoch(0)
    a0 = ds[0][0].copy()
    ds.set_epoch(0)
    assert np.array_equal(ds[0][0], a0)          # deterministic
    ds.set_epoch(1)
    assert not np.array_equal(ds[0][0], a0)      # resampled next epoch


def test_pipeline_pad_remainder_smaller_than_batch():
    # a test set SMALLER than the batch must still yield one padded
    # batch (idx[:total-n] under-padded and produced zero batches)
    from mm3d_tpu.data.pipeline import DataPipeline
    ds = [(np.full((4, 3), i, np.float32), i) for i in range(3)]
    pipe = DataPipeline(ds, batch_size=8, shuffle=False, to_device=False,
                        pad_remainder=True)
    batches = list(pipe.epoch(0))
    assert len(batches) == 1
    (pts, lab), valid = batches[0]
    assert pts.shape[0] == 8
    assert valid.tolist() == [True] * 3 + [False] * 5
    # wrapped rows cycle the dataset
    assert lab.tolist() == [0, 1, 2, 0, 1, 2, 0, 1]

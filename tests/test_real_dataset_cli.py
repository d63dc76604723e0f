"""--dataset/--data_root CLI wiring over tiny generated real-format
fixtures (VERDICT r4 item 3): a user with an on-disk ModelNet40 or S3DIS
tree trains and evaluates without writing Python.

Fixture writers are shared with tests/test_loaders_native.py; models are
the cheapest per family (plain PointNet) to keep suite time flat.
"""

import os

import numpy as np
import pytest

from tests.test_loaders_native import _write_modelnet


def _write_s3dis(root, rooms=("Area_1_office.npy", "Area_5_office.npy"),
                 n=400):
    rng = np.random.RandomState(7)
    for name in rooms:
        xyz = rng.rand(n, 3) * [4, 4, 3]
        rgb = rng.randint(0, 255, (n, 3))
        lbl = rng.randint(0, 13, (n, 1))
        np.save(os.path.join(root, name),
                np.concatenate([xyz, rgb, lbl], -1))


def test_modelnet40_cli_roundtrip(tmp_path):
    # shapes deliberately match test_classification_train_smoke
    # (pointnet_cls, npoint 64, batch 8, num_class 4, default augs) so
    # the jitted steps are persistent-cache hits, not fresh compiles
    import train as train_cli
    import test as test_cli
    data = tmp_path / "data"
    os.makedirs(data)
    _write_modelnet(str(data), classes=("a", "b", "c", "d"))  # 8 tr/4 te
    log = tmp_path / "log"
    res = train_cli.main([
        "--model", "pointnet_cls", "--epoch", "1", "--batch_size", "8",
        "--npoint", "64", "--num_class", "4",
        "--dataset", "modelnet40", "--data_root", str(data),
        "--log_dir", str(log), "--run_name", "mn"])
    assert "instance_acc" in res
    run_dir = os.path.join(str(log), "classification", "mn")
    ev = test_cli.main([
        "--model", "pointnet_cls", "--log_dir", run_dir, "--npoint", "64",
        "--num_class", "4", "--batch_size", "8",
        "--dataset", "modelnet40", "--data_root", str(data)])
    # the real test split has exactly 4 shapes; accuracy is over those
    assert 0.0 <= ev["instance_acc"] <= 1.0


def test_s3dis_cli_roundtrip(tmp_path):
    import train as train_cli
    import test as test_cli
    data = tmp_path / "data"
    os.makedirs(data)
    _write_s3dis(str(data))
    log = tmp_path / "log"
    res = train_cli.main([
        "--model", "pointnet_sem_seg", "--epoch", "1", "--batch_size", "4",
        "--npoint", "128",
        "--dataset", "s3dis", "--data_root", str(data),
        "--test_area", "5", "--log_dir", str(log), "--run_name", "s3"])
    assert "miou" in res
    run_dir = os.path.join(str(log), "semseg", "s3")
    ev = test_cli.main([
        "--model", "pointnet_sem_seg", "--log_dir", run_dir,
        "--npoint", "128", "--batch_size", "4",
        "--dataset", "s3dis", "--data_root", str(data), "--test_area", "5"])
    assert 0.0 <= ev["miou"] <= 1.0
    # --scene area: whole-test-area stitching straight from the tree —
    # only the held-out Area_5 room is scored
    ev2 = test_cli.main([
        "--model", "pointnet_sem_seg", "--log_dir", run_dir,
        "--npoint", "128", "--batch_size", "4",
        "--dataset", "s3dis", "--data_root", str(data),
        "--test_area", "5", "--scene", "area",
        "--block_size", "4.0", "--stride", "4.0"])
    assert ev2["rooms"] == 1
    assert {"coverage", "point_acc", "miou"} <= set(ev2)


def test_shapenetpart_and_multimodal_cli_mapping(tmp_path):
    """The two remaining --dataset mappings, sample-contract level (no
    training — the modelnet/s3dis roundtrips already cover the Trainer
    plumbing; this keeps suite time flat)."""
    import json
    import train as train_cli

    # shapenetpart fixture
    sp = tmp_path / "sp"
    os.makedirs(sp / "train_test_split")
    rng = np.random.RandomState(11)
    with open(sp / "synsetoffset2category.txt", "w") as f:
        f.write("Airplane\t02691156\n")
    os.makedirs(sp / "02691156")
    files = []
    for i in range(2):
        files.append(f"shape_data/02691156/s{i}")
        data = np.concatenate([rng.randn(40, 6),
                               rng.randint(0, 4, (40, 1))], -1)
        np.savetxt(sp / "02691156" / f"s{i}.txt", data, fmt="%.5f")
    for split in ("train", "test"):
        json.dump(files, open(
            sp / "train_test_split" /
            f"shuffled_{split}_file_list.json", "w"))

    class A:  # minimal argparse-namespace stand-in
        dataset = "shapenetpart"
        data_root = str(sp)
        normal = False
        test_area = 5
        uniform_sample = False
        num_class = 2  # matches the modelnet fixture below
    tr, te = train_cli.build_cli_datasets(A, "partseg", 64)
    pts, cat, seg = tr[0]
    assert pts.shape == (64, 3) and seg.shape == (64,) and cat == 0
    assert len(te) == 2

    # multimodal (fusion_cls base = modelnet) with per-split view dirs
    mm = tmp_path / "mm"
    os.makedirs(mm)
    _write_modelnet(str(mm))
    for split, n in (("train", 4), ("test", 2)):
        vd = mm / f"views_{split}"
        os.makedirs(vd)
        for i in range(n):
            np.savez(vd / f"{i}.npz",
                     image=np.zeros((16, 16, 3), np.float32),
                     K=np.eye(3, dtype=np.float32),
                     R=np.eye(3, dtype=np.float32),
                     t=np.zeros(3, np.float32))

    class B(A):
        dataset = "multimodal"
        data_root = str(mm)
    tr2, te2 = train_cli.build_cli_datasets(B, "fusion_cls", 32)
    s = tr2[0]
    assert set(s) >= {"points", "image", "K", "R", "t", "label"}
    assert te2[0]["image"].shape == (16, 16, 3)

    # test-only build skips the train split entirely
    tr3, te3 = train_cli.build_cli_datasets(B, "fusion_cls", 32,
                                            test_only=True)
    assert tr3 is None and te3 is not None

    # class-count guard: MORE tree classes than the head is a clean
    # error (labels past the head would be silently clamped); fewer is
    # legitimate (subset tree under a bigger checkpoint) and only notes
    class C(B):
        num_class = 1
    with pytest.raises(SystemExit, match="num_class"):
        train_cli.build_cli_datasets(C, "fusion_cls", 32)

    class D(B):
        num_class = 40
    tr4, _ = train_cli.build_cli_datasets(D, "fusion_cls", 32)
    assert tr4 is not None  # no error for the subset-tree case


def test_dataset_task_mismatch_fails_early(tmp_path):
    """A classification dataset refuses to feed a semseg model."""
    from mm3d_tpu.data.loaders import build_real_datasets
    with pytest.raises(ValueError, match="task"):
        build_real_datasets("modelnet40", str(tmp_path), "semseg",
                            npoints=32)


def test_missing_data_root_is_a_clean_error():
    import train as train_cli
    with pytest.raises(SystemExit, match="data_root"):
        train_cli.main([
            "--model", "pointnet_cls", "--dataset", "modelnet40",
            "--epoch", "1", "--no_checkpoint"])


def test_missing_views_dir_is_a_clean_error(tmp_path):
    """multimodal without views_<split>/ or views/ fails at build time
    with a message naming both candidates, not per-sample mid-epoch
    (code-review r5)."""
    from mm3d_tpu.data.loaders import build_real_datasets
    _write_modelnet(str(tmp_path))
    with pytest.raises(FileNotFoundError, match="views"):
        build_real_datasets("multimodal", str(tmp_path), "fusion_cls",
                            npoints=32)


def test_example_batch_wraps_short_dataset():
    """_example_batch on a dataset smaller than batch_size wraps like
    the pipeline's pad-remainder instead of IndexError (code-review r5
    — the test.py --export path collates one example batch directly)."""
    import types
    from mm3d_tpu.training.loop import Trainer

    ds = [(np.full((8, 3), float(i), np.float32), i) for i in range(3)]
    stub = types.SimpleNamespace(cfg=types.SimpleNamespace(batch_size=5))
    batch = Trainer._example_batch(stub, ds)
    assert batch[0].shape == (5, 8, 3) and list(batch[1]) == [0, 1, 2, 0, 1]

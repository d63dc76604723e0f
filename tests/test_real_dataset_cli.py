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
    import train as train_cli
    import test as test_cli
    data = tmp_path / "data"
    os.makedirs(data)
    _write_modelnet(str(data))  # 2 classes, 4 train / 2 test shapes
    log = tmp_path / "log"
    res = train_cli.main([
        "--model", "pointnet_cls", "--epoch", "1", "--batch_size", "4",
        "--npoint", "32", "--num_class", "2",
        "--dataset", "modelnet40", "--data_root", str(data),
        "--log_dir", str(log), "--run_name", "mn"])
    assert "instance_acc" in res
    run_dir = os.path.join(str(log), "classification", "mn")
    ev = test_cli.main([
        "--model", "pointnet_cls", "--log_dir", run_dir, "--npoint", "32",
        "--num_class", "2", "--batch_size", "4",
        "--dataset", "modelnet40", "--data_root", str(data)])
    # the real test split has exactly 2 shapes; accuracy is over those
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

"""Real-format loaders against generated fixtures + native C++ IO and
renderer (SURVEY.md §2.1/2.2 inventory)."""

import json
import os

import numpy as np
import pytest

from mm3d_tpu.data import loaders, native_io
from mm3d_tpu.utils import visualizer


def _write_modelnet(root, classes=("airplane", "chair"), per_class=3,
                    rows=64):
    rng = np.random.RandomState(0)
    with open(os.path.join(root, "modelnet40_shape_names.txt"), "w") as f:
        f.write("\n".join(classes) + "\n")
    ids = {"train": [], "test": []}
    for c in classes:
        os.makedirs(os.path.join(root, c), exist_ok=True)
        for i in range(per_class):
            sid = f"{c}_{i:04d}"
            split = "train" if i < per_class - 1 else "test"
            ids[split].append(sid)
            data = rng.randn(rows, 6).astype(np.float32)
            with open(os.path.join(root, c, sid + ".txt"), "w") as f:
                for row in data:
                    f.write(",".join(f"{v:.6f}" for v in row) + "\n")
    for split, lst in ids.items():
        with open(os.path.join(root, f"modelnet40_{split}.txt"), "w") as f:
            f.write("\n".join(lst) + "\n")


def test_modelnet_loader(tmp_path):
    _write_modelnet(str(tmp_path))
    ds = loaders.ModelNetDataset(str(tmp_path), "train", npoints=32,
                                 normals=True)
    assert len(ds) == 4
    pts, label = ds[0]
    assert pts.shape == (32, 6) and pts.dtype == np.float32
    assert 0 <= label < 2
    # pc_normalize applied
    assert np.linalg.norm(pts[:, :3], axis=1).max() <= 1.0 + 1e-5
    # uniform (FPS) sampling path
    ds2 = loaders.ModelNetDataset(str(tmp_path), "test", npoints=16,
                                  uniform_sample=True)
    p2, _ = ds2[0]
    assert p2.shape == (16, 3)


def test_shapenetpart_loader(tmp_path):
    rng = np.random.RandomState(1)
    cats = [("Airplane", "02691156"), ("Chair", "03001627")]
    with open(tmp_path / "synsetoffset2category.txt", "w") as f:
        for name, syn in cats:
            f.write(f"{name}\t{syn}\n")
    os.makedirs(tmp_path / "train_test_split", exist_ok=True)
    files = []
    for _, syn in cats:
        os.makedirs(tmp_path / syn, exist_ok=True)
        for i in range(2):
            sid = f"shape{i}"
            files.append(f"shape_data/{syn}/{sid}")
            data = np.concatenate(
                [rng.randn(50, 6), rng.randint(0, 4, (50, 1))], -1)
            np.savetxt(tmp_path / syn / (sid + ".txt"), data, fmt="%.6f")
    json.dump(files, open(tmp_path / "train_test_split" /
                          "shuffled_train_file_list.json", "w"))
    ds = loaders.ShapeNetPartDataset(str(tmp_path), "train", npoints=64,
                                     normals=False)
    assert len(ds) == 4
    pts, cat, seg = ds[1]
    assert pts.shape == (64, 3) and seg.shape == (64,)
    assert 0 <= cat < 2 and seg.max() < 4


def test_s3dis_loader(tmp_path):
    rng = np.random.RandomState(2)
    for name in ("Area_1_office.npy", "Area_5_office.npy"):
        xyz = rng.rand(500, 3) * [4, 4, 3]
        rgb = rng.randint(0, 255, (500, 3))
        lbl = rng.randint(0, 13, (500, 1))
        np.save(tmp_path / name, np.concatenate([xyz, rgb, lbl], -1))
    tr = loaders.S3DISDataset(str(tmp_path), "train", npoints=128,
                              samples_per_room=2)
    te = loaders.S3DISDataset(str(tmp_path), "test", npoints=128,
                              samples_per_room=2)
    assert len(tr) == 2 and len(te) == 2
    feats, seg = tr[0]
    assert feats.shape == (128, 9) and seg.shape == (128,)
    assert feats[:, 3:6].max() <= 1.0 + 1e-6  # rgb scaled
    assert seg.max() < 13


def test_multimodal_paired_loader(tmp_path):
    _write_modelnet(str(tmp_path))
    base = loaders.ModelNetDataset(str(tmp_path), "train", npoints=32)
    views = tmp_path / "views"
    os.makedirs(views)
    for i in range(len(base)):
        np.savez(views / f"{i}.npz",
                 image=np.zeros((16, 16, 3), np.float32),
                 K=np.eye(3, dtype=np.float32),
                 R=np.eye(3, dtype=np.float32),
                 t=np.zeros(3, np.float32))
    ds = loaders.MultimodalPairedDataset(base, str(views))
    s = ds[0]
    assert set(s) >= {"points", "image", "K", "R", "t", "label"}
    assert s["image"].shape == (16, 16, 3)


def test_native_parser_matches_numpy(tmp_path):
    rng = np.random.RandomState(3)
    data = rng.randn(100, 6).astype(np.float32)
    p_comma = tmp_path / "c.txt"
    with open(p_comma, "w") as f:
        for row in data:
            f.write(",".join(f"{v:.6f}" for v in row) + "\n")
    if not native_io.available():
        pytest.skip("native toolchain unavailable")
    got = native_io.parse_table(str(p_comma), 6)
    want = np.loadtxt(p_comma, delimiter=",", dtype=np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    # space-separated, multiple files threaded
    p_sp = tmp_path / "s.txt"
    np.savetxt(p_sp, data, fmt="%.6f")
    many = native_io.parse_many([str(p_comma), str(p_sp)], 6)
    np.testing.assert_allclose(many[0], want, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(many[1], want, rtol=1e-4, atol=1e-5)


def test_visualizer_renders_png(tmp_path):
    rng = np.random.RandomState(4)
    pts = rng.randn(500, 3).astype(np.float32)
    labels = rng.randint(0, 13, 500)
    out = visualizer.show_points(pts, labels=labels,
                                 out_path=str(tmp_path / "cloud.png"),
                                 hw=(64, 64))
    assert os.path.exists(out) and os.path.getsize(out) > 100
    img = visualizer.render_points(pts, hw=(48, 48))
    assert img.shape == (48, 48, 3)
    assert img.min() >= 0 and img.max() <= 1.0 + 1e-6
    # something was actually drawn (not all background)
    assert (img != 1.0).any()


def test_s3dis_area_match_is_delimited(tmp_path):
    """Area_1 must not swallow Area_10 rooms (substring-match bug,
    code-review r5) — shared by the loader split and test.py --scene
    area."""
    rng = np.random.RandomState(5)
    for name in ("Area_1_office.npy", "Area_10_office.npy"):
        data = np.concatenate([rng.rand(64, 3) * 4,
                               rng.randint(0, 255, (64, 3)),
                               rng.randint(0, 13, (64, 1))], -1)
        np.save(tmp_path / name, data)
    assert loaders.s3dis_room_in_area("Area_1_office.npy", 1)
    assert not loaders.s3dis_room_in_area("Area_10_office.npy", 1)
    te = loaders.S3DISDataset(str(tmp_path), "test", npoints=32,
                              test_area=1, samples_per_room=1)
    tr = loaders.S3DISDataset(str(tmp_path), "train", npoints=32,
                              test_area=1, samples_per_room=1)
    assert len(te.rooms) == 1 and "Area_1_office" in te.rooms[0]
    assert len(tr.rooms) == 1 and "Area_10_office" in tr.rooms[0]


def test_modelnet_short_file_pads_to_npoints(tmp_path):
    """A shape file with fewer rows than npoints wrap-pads instead of
    yielding a ragged sample (code-review r5: np.stack raised or N
    silently shrank)."""
    _write_modelnet(str(tmp_path), rows=16)
    from mm3d_tpu.data.loaders import ModelNetDataset
    for uniform in (False, True):
        ds = ModelNetDataset(str(tmp_path), "train", npoints=32,
                             uniform_sample=uniform)
        pts, label = ds[0]
        assert pts.shape == (32, 3)
        # wrap-pad duplicates the early rows
        np.testing.assert_array_equal(pts[:16], pts[16:])

"""Canonical-lineage torch checkpoint import/export
(mm3d_tpu.utils.torch_import).

Two layers of validation:

* **Canonical-module parity** — minimal torch modules with the *public
  lineage's* naming (``mlp_convs.{i}``/``mlp_bns.{i}`` Conv2d stacks,
  ``conv_blocks.{s}.{l}`` MSG blocks, ``fp*.mlp_convs`` Conv1d, fc/bn
  heads) load `export_state_dict`'s output through the real
  ``nn.Module.load_state_dict`` and must reproduce the flax model's
  eval logits.  This pins the key names, the kernel transpose, the BN
  key mapping, and the project-first row splits against genuine torch
  Conv/BN semantics — exactly what a user's trained ``.pth`` relies on.
* **Roundtrip** — import(export(v)) is bit-identical to v for every
  supported model (covers semseg / partseg-MSG / plain-PointNet trees
  that have no canonical twin here).
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp
import jax.tree_util as jtu

from mm3d_tpu.models import get_model
from mm3d_tpu.utils.torch_import import (
    SUPPORTED, export_state_dict, import_state_dict, load_torch_checkpoint)
from oracle import torch_ops as tops
from test_logits_parity import _trained_variables


# ------------------------------------------------- canonical torch modules

class CanonSA(nn.Module):
    """Lineage PointNetSetAbstraction: Conv2d 1x1 stacks named
    mlp_convs/mlp_bns, channels-first [B, C, K, S] compute."""

    def __init__(self, npoint, radius, nsample, in_channels, mlp,
                 group_all=False):
        super().__init__()
        self.npoint, self.radius, self.nsample = npoint, radius, nsample
        self.group_all = group_all
        self.mlp_convs = nn.ModuleList()
        self.mlp_bns = nn.ModuleList()
        last = in_channels
        for out in mlp:
            self.mlp_convs.append(nn.Conv2d(last, out, 1))
            self.mlp_bns.append(nn.BatchNorm2d(out))
            last = out

    def forward(self, xyz, feats):
        if self.group_all:
            new_xyz, grouped = tops.sample_and_group_all(xyz, feats)
        else:
            new_xyz, grouped = tops.sample_and_group(
                self.npoint, self.radius, self.nsample, xyz, feats)
        h = grouped.permute(0, 3, 2, 1)  # [B, S, K, C] -> [B, C, K, S]
        for conv, bn in zip(self.mlp_convs, self.mlp_bns):
            h = F.relu(bn(conv(h)))
        return new_xyz, h.max(dim=2)[0].permute(0, 2, 1)


class CanonSAMsg(nn.Module):
    """Lineage MSG block: per-scale conv_blocks.{s}/bn_blocks.{s}."""

    def __init__(self, npoint, radius_list, nsample_list, in_channels,
                 mlp_list):
        super().__init__()
        self.npoint = npoint
        self.radius_list, self.nsample_list = radius_list, nsample_list
        self.conv_blocks = nn.ModuleList()
        self.bn_blocks = nn.ModuleList()
        for m in mlp_list:
            convs, bns = nn.ModuleList(), nn.ModuleList()
            last = in_channels + 3
            for out in m:
                convs.append(nn.Conv2d(last, out, 1))
                bns.append(nn.BatchNorm2d(out))
                last = out
            self.conv_blocks.append(convs)
            self.bn_blocks.append(bns)

    def forward(self, xyz, feats):
        fps_idx = tops.farthest_point_sample(xyz, self.npoint)
        new_xyz = tops.index_points(xyz, fps_idx)
        outs = []
        for i, (r, k) in enumerate(zip(self.radius_list, self.nsample_list)):
            idx = tops.query_ball_point(r, k, xyz, new_xyz)
            grouped_xyz = tops.index_points(xyz, idx) - new_xyz.unsqueeze(2)
            if feats is not None:
                grouped = torch.cat(
                    [grouped_xyz, tops.index_points(feats, idx)], -1)
            else:
                grouped = grouped_xyz
            h = grouped.permute(0, 3, 2, 1)
            for conv, bn in zip(self.conv_blocks[i], self.bn_blocks[i]):
                h = F.relu(bn(conv(h)))
            outs.append(h.max(dim=2)[0].permute(0, 2, 1))
        return new_xyz, torch.cat(outs, -1)


class CanonFP(nn.Module):
    """Lineage PointNetFeaturePropagation: Conv1d mlp_convs/mlp_bns."""

    def __init__(self, in_channels, mlp):
        super().__init__()
        self.mlp_convs = nn.ModuleList()
        self.mlp_bns = nn.ModuleList()
        last = in_channels
        for out in mlp:
            self.mlp_convs.append(nn.Conv1d(last, out, 1))
            self.mlp_bns.append(nn.BatchNorm1d(out))
            last = out

    def forward(self, xyz1, xyz2, feats1, feats2):
        B, N, _ = xyz1.shape
        if xyz2.shape[1] == 1:
            interpolated = feats2.expand(B, N, feats2.shape[-1])
        else:
            dists, idx = tops.three_nn(xyz1, xyz2)
            weight = tops.interpolation_weights(dists)
            interpolated = tops.three_interpolate(feats2, idx, weight)
        if feats1 is not None:
            interpolated = torch.cat([feats1, interpolated], -1)
        h = interpolated.permute(0, 2, 1)
        for conv, bn in zip(self.mlp_convs, self.mlp_bns):
            h = F.relu(bn(conv(h)))
        return h.permute(0, 2, 1)


class CanonClsSSG(nn.Module):
    def __init__(self, num_class):
        super().__init__()
        self.sa1 = CanonSA(512, 0.2, 32, 3, [64, 64, 128])
        self.sa2 = CanonSA(128, 0.4, 64, 128 + 3, [128, 128, 256])
        self.sa3 = CanonSA(None, None, None, 256 + 3, [256, 512, 1024],
                           group_all=True)
        self.fc1 = nn.Linear(1024, 512)
        self.bn1 = nn.BatchNorm1d(512)
        self.fc2 = nn.Linear(512, 256)
        self.bn2 = nn.BatchNorm1d(256)
        self.fc3 = nn.Linear(256, num_class)

    def forward(self, points):
        xyz, f = self.sa1(points[..., :3], None)
        xyz, f = self.sa2(xyz, f)
        _, f = self.sa3(xyz, f)
        h = f[:, 0]
        h = F.relu(self.bn1(self.fc1(h)))
        h = F.relu(self.bn2(self.fc2(h)))
        return F.log_softmax(self.fc3(h), dim=-1)


class CanonClsMSG(nn.Module):
    def __init__(self, num_class):
        super().__init__()
        self.sa1 = CanonSAMsg(512, [0.1, 0.2, 0.4], [16, 32, 128], 0,
                              [[32, 32, 64], [64, 64, 128], [64, 96, 128]])
        self.sa2 = CanonSAMsg(128, [0.2, 0.4, 0.8], [32, 64, 128],
                              64 + 128 + 128,
                              [[64, 64, 128], [128, 128, 256],
                               [128, 128, 256]])
        self.sa3 = CanonSA(None, None, None, 128 + 256 + 256 + 3,
                           [256, 512, 1024], group_all=True)
        self.fc1 = nn.Linear(1024, 512)
        self.bn1 = nn.BatchNorm1d(512)
        self.fc2 = nn.Linear(512, 256)
        self.bn2 = nn.BatchNorm1d(256)
        self.fc3 = nn.Linear(256, num_class)

    def forward(self, points):
        xyz, f = self.sa1(points[..., :3], None)
        xyz, f = self.sa2(xyz, f)
        _, f = self.sa3(xyz, f)
        h = f[:, 0]
        h = F.relu(self.bn1(self.fc1(h)))
        h = F.relu(self.bn2(self.fc2(h)))
        return F.log_softmax(self.fc3(h), dim=-1)


class CanonPartSegSSG(nn.Module):
    def __init__(self, num_part=50, num_category=16):
        super().__init__()
        self.num_category = num_category
        self.sa1 = CanonSA(512, 0.2, 32, 3, [64, 64, 128])
        self.sa2 = CanonSA(128, 0.4, 64, 128 + 3, [128, 128, 256])
        self.sa3 = CanonSA(None, None, None, 256 + 3, [256, 512, 1024],
                           group_all=True)
        self.fp3 = CanonFP(1024 + 256, [256, 256])
        self.fp2 = CanonFP(256 + 128, [256, 128])
        self.fp1 = CanonFP(128 + num_category + 3 + 3, [128, 128, 128])
        self.conv1 = nn.Conv1d(128, 128, 1)
        self.bn1 = nn.BatchNorm1d(128)
        self.conv2 = nn.Conv1d(128, num_part, 1)

    def forward(self, points, onehot):
        B, N, _ = points.shape
        l0_xyz = points[..., :3]
        l1_xyz, l1_f = self.sa1(l0_xyz, None)
        l2_xyz, l2_f = self.sa2(l1_xyz, l1_f)
        l3_xyz, l3_f = self.sa3(l2_xyz, l2_f)
        l2_f = self.fp3(l2_xyz, l3_xyz, l2_f, l3_f)
        l1_f = self.fp2(l1_xyz, l2_xyz, l1_f, l2_f)
        cls_tiled = onehot.unsqueeze(1).expand(B, N, self.num_category)
        l0_skip = torch.cat([cls_tiled, l0_xyz, points], -1)
        l0_f = self.fp1(l0_xyz, l1_xyz, l0_skip, l1_f)
        h = F.relu(self.bn1(self.conv1(l0_f.permute(0, 2, 1))))
        return F.log_softmax(self.conv2(h).permute(0, 2, 1), dim=-1)


class CanonPointNetPartSeg(nn.Module):
    """Lineage pointnet_part_seg: conv1-5/bn1-5 trunk (bn5 un-activated
    before the global max), STNkd(128) feature transform, 4944-channel
    head concat [global+label, out1, out2, out3, out4, out5]."""

    def __init__(self, part_num=50, num_category=16, channel=3):
        super().__init__()
        self.num_category = num_category
        self.stn = CanonSTN(channel, 3)
        self.conv1 = nn.Conv1d(channel, 64, 1)
        self.conv2 = nn.Conv1d(64, 128, 1)
        self.conv3 = nn.Conv1d(128, 128, 1)
        self.conv4 = nn.Conv1d(128, 512, 1)
        self.conv5 = nn.Conv1d(512, 2048, 1)
        self.bn1 = nn.BatchNorm1d(64)
        self.bn2 = nn.BatchNorm1d(128)
        self.bn3 = nn.BatchNorm1d(128)
        self.bn4 = nn.BatchNorm1d(512)
        self.bn5 = nn.BatchNorm1d(2048)
        self.fstn = CanonSTN(128, 128)
        self.convs1 = nn.Conv1d(2048 + num_category + 64 + 128 + 128
                                + 512 + 2048, 256, 1)
        self.convs2 = nn.Conv1d(256, 256, 1)
        self.convs3 = nn.Conv1d(256, 128, 1)
        self.convs4 = nn.Conv1d(128, part_num, 1)
        self.bns1 = nn.BatchNorm1d(256)
        self.bns2 = nn.BatchNorm1d(256)
        self.bns3 = nn.BatchNorm1d(128)

    def forward(self, points, onehot):  # points [B, N, C]
        B, N, C = points.shape
        t = self.stn(points.permute(0, 2, 1))
        xyz = torch.bmm(points[..., :3], t)
        x = torch.cat([xyz, points[..., 3:]], -1) if C > 3 else xyz
        out1 = F.relu(self.bn1(self.conv1(x.permute(0, 2, 1))))
        out2 = F.relu(self.bn2(self.conv2(out1)))
        out3 = F.relu(self.bn3(self.conv3(out2)))
        tf = self.fstn(out3)
        net = torch.bmm(out3.permute(0, 2, 1), tf).permute(0, 2, 1)
        out4 = F.relu(self.bn4(self.conv4(net)))
        out5 = self.bn5(self.conv5(out4))
        gf = torch.max(out5, 2)[0]
        gf = torch.cat([gf, onehot], 1)
        expand = gf.unsqueeze(2).expand(B, gf.shape[1], N)
        h = torch.cat([expand, out1, out2, out3, out4, out5], 1)
        h = F.relu(self.bns1(self.convs1(h)))
        h = F.relu(self.bns2(self.convs2(h)))
        h = F.relu(self.bns3(self.convs3(h)))
        return F.log_softmax(self.convs4(h).permute(0, 2, 1), dim=-1)


class CanonSTN(nn.Module):
    """Lineage STN3d/STNkd: conv1-3/bn1-3 + fc1-3/bn4-5, + identity."""

    def __init__(self, channel, k):
        super().__init__()
        self.k = k
        self.conv1 = nn.Conv1d(channel, 64, 1)
        self.conv2 = nn.Conv1d(64, 128, 1)
        self.conv3 = nn.Conv1d(128, 1024, 1)
        self.fc1 = nn.Linear(1024, 512)
        self.fc2 = nn.Linear(512, 256)
        self.fc3 = nn.Linear(256, k * k)
        self.bn1 = nn.BatchNorm1d(64)
        self.bn2 = nn.BatchNorm1d(128)
        self.bn3 = nn.BatchNorm1d(1024)
        self.bn4 = nn.BatchNorm1d(512)
        self.bn5 = nn.BatchNorm1d(256)

    def forward(self, x):  # [B, C, N]
        h = F.relu(self.bn1(self.conv1(x)))
        h = F.relu(self.bn2(self.conv2(h)))
        h = F.relu(self.bn3(self.conv3(h)))
        h = torch.max(h, 2)[0]
        h = F.relu(self.bn4(self.fc1(h)))
        h = F.relu(self.bn5(self.fc2(h)))
        return self.fc3(h).view(-1, self.k, self.k) + torch.eye(self.k)


class CanonEncoder(nn.Module):
    """Lineage PointNetEncoder (feat.*): STN-aligned conv1-3 trunk.
    global_feat=False emits cat([global, point], 1) — GLOBAL FIRST,
    the opposite order from our encoder (torch_import permutes)."""

    def __init__(self, global_feat, feature_transform, channel):
        super().__init__()
        self.global_feat = global_feat
        self.feature_transform = feature_transform
        self.stn = CanonSTN(channel, 3)
        self.conv1 = nn.Conv1d(channel, 64, 1)
        self.conv2 = nn.Conv1d(64, 128, 1)
        self.conv3 = nn.Conv1d(128, 1024, 1)
        self.bn1 = nn.BatchNorm1d(64)
        self.bn2 = nn.BatchNorm1d(128)
        self.bn3 = nn.BatchNorm1d(1024)
        if feature_transform:
            self.fstn = CanonSTN(64, 64)

    def forward(self, x):  # [B, N, C] at the boundary
        B, N, C = x.shape
        t = self.stn(x.permute(0, 2, 1))
        xyz = torch.bmm(x[..., :3], t)
        x = torch.cat([xyz, x[..., 3:]], -1) if C > 3 else xyz
        h = F.relu(self.bn1(self.conv1(x.permute(0, 2, 1))))
        if self.feature_transform:
            tf = self.fstn(h)
            h = torch.bmm(h.permute(0, 2, 1), tf).permute(0, 2, 1)
        point_feat = h
        h = self.bn3(self.conv3(F.relu(self.bn2(self.conv2(h)))))
        gf = torch.max(h, 2)[0]
        if self.global_feat:
            return gf
        tiled = gf.unsqueeze(2).expand(B, 1024, N)
        return torch.cat([tiled, point_feat], 1)


class CanonPointNetCls(nn.Module):
    def __init__(self, num_class):
        super().__init__()
        self.feat = CanonEncoder(True, True, 3)
        self.fc1 = nn.Linear(1024, 512)
        self.bn1 = nn.BatchNorm1d(512)
        self.fc2 = nn.Linear(512, 256)
        self.bn2 = nn.BatchNorm1d(256)
        self.fc3 = nn.Linear(256, num_class)

    def forward(self, points):
        h = self.feat(points)
        h = F.relu(self.bn1(self.fc1(h)))
        h = F.relu(self.bn2(self.fc2(h)))  # dropout = identity in eval
        return F.log_softmax(self.fc3(h), dim=-1)


class CanonPointNetSemSeg(nn.Module):
    def __init__(self, num_class, channel=9):
        super().__init__()
        self.feat = CanonEncoder(False, True, channel)
        self.conv1 = nn.Conv1d(1088, 512, 1)
        self.conv2 = nn.Conv1d(512, 256, 1)
        self.conv3 = nn.Conv1d(256, 128, 1)
        self.conv4 = nn.Conv1d(128, num_class, 1)
        self.bn1 = nn.BatchNorm1d(512)
        self.bn2 = nn.BatchNorm1d(256)
        self.bn3 = nn.BatchNorm1d(128)

    def forward(self, points):
        h = self.feat(points)  # [B, 1088, N], global first
        h = F.relu(self.bn1(self.conv1(h)))
        h = F.relu(self.bn2(self.conv2(h)))
        h = F.relu(self.bn3(self.conv3(h)))
        return F.log_softmax(self.conv4(h).permute(0, 2, 1), dim=-1)


# ----------------------------------------------------------------- helpers

def _strict_load(module, sd):
    """load_state_dict, requiring every exported key to land and the only
    absent keys to be torch's num_batches_tracked counters (which the
    import side likewise ignores)."""
    res = module.load_state_dict(
        {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
        strict=False)
    assert res.unexpected_keys == [], res.unexpected_keys
    assert all(k.endswith("num_batches_tracked") for k in res.missing_keys), \
        res.missing_keys


def _flax_eval(model, variables, *args):
    with jax.default_matmul_precision("float32"):
        out = jax.jit(lambda v: model.apply(v, *args, train=False))(variables)
    return np.asarray(out[0] if isinstance(out, tuple) else out)


def _roundtrip_exact(name, variables):
    sd = export_state_dict(name, variables)
    back = import_state_dict(name, variables, sd)
    want = {jtu.keystr(p): np.asarray(l) for p, l in
            jtu.tree_leaves_with_path(
                {"params": jtu.tree_map(np.asarray, dict(variables["params"])),
                 "batch_stats": jtu.tree_map(
                     np.asarray, dict(variables["batch_stats"]))})}
    got = {jtu.keystr(p): l for p, l in jtu.tree_leaves_with_path(back)}
    assert set(want) == set(got), sorted(set(want) ^ set(got))[:8]
    for k in want:
        np.testing.assert_array_equal(want[k], got[k], err_msg=k)
    return sd


# ------------------------------------------------------------------- tests

def test_export_loads_into_canonical_cls_ssg():
    spec = get_model("pointnet2_cls_ssg")
    model = spec.builder(num_class=5)
    pts = jnp.asarray(
        np.random.RandomState(1).randn(2, 256, 3).astype(np.float32))
    variables = _trained_variables(model, (pts,))
    sd = _roundtrip_exact("pointnet2_cls_ssg", variables)

    canon = CanonClsSSG(num_class=5).eval()
    _strict_load(canon, sd)
    with torch.no_grad():
        logp_t = canon(torch.from_numpy(np.asarray(pts)))
    np.testing.assert_allclose(
        _flax_eval(model, variables, pts), logp_t.numpy(),
        rtol=1e-4, atol=1e-4)


def test_export_loads_into_canonical_cls_msg():
    spec = get_model("pointnet2_cls_msg")
    model = spec.builder(num_class=5)
    pts = jnp.asarray(
        np.random.RandomState(2).randn(2, 256, 3).astype(np.float32))
    variables = _trained_variables(model, (pts,), nsteps=2)
    sd = _roundtrip_exact("pointnet2_cls_msg", variables)

    canon = CanonClsMSG(num_class=5).eval()
    _strict_load(canon, sd)
    with torch.no_grad():
        logp_t = canon(torch.from_numpy(np.asarray(pts)))
    np.testing.assert_allclose(
        _flax_eval(model, variables, pts), logp_t.numpy(),
        rtol=1e-4, atol=1e-4)


def test_export_loads_into_canonical_part_seg_ssg(tmp_path):
    spec = get_model("pointnet2_part_seg_ssg")
    model = spec.builder()
    rng = np.random.RandomState(3)
    pts = jnp.asarray(rng.randn(2, 256, 3).astype(np.float32))
    onehot = jax.nn.one_hot(jnp.array([4, 9]), 16)
    variables = _trained_variables(model, (pts, onehot), nsteps=2)
    sd = _roundtrip_exact("pointnet2_part_seg_ssg", variables)

    canon = CanonPartSegSSG().eval()
    _strict_load(canon, sd)
    with torch.no_grad():
        logp_t = canon(torch.from_numpy(np.asarray(pts)),
                       torch.from_numpy(np.asarray(onehot)))
    np.testing.assert_allclose(
        _flax_eval(model, variables, pts, onehot), logp_t.numpy(),
        rtol=1e-4, atol=1e-4)

    # the .pth entry point: lineage checkpoint wrapper + DataParallel prefix
    ckpt = {"epoch": 7, "model_state_dict":
            {"module." + k: torch.from_numpy(np.asarray(v))
             for k, v in sd.items()}}
    path = str(tmp_path / "best_model.pth")
    torch.save(ckpt, path)
    loaded = load_torch_checkpoint("pointnet2_part_seg_ssg", variables, path)
    for (p1, l1), (p2, l2) in zip(
            jtu.tree_leaves_with_path(loaded),
            jtu.tree_leaves_with_path(import_state_dict(
                "pointnet2_part_seg_ssg", variables, sd))):
        assert jtu.keystr(p1) == jtu.keystr(p2)
        np.testing.assert_array_equal(l1, l2)


def test_export_loads_into_canonical_pointnet_cls():
    """Pins the feat.* encoder walk (STN fc/bn offsets, conv transposes)
    against real lineage modules, not just a roundtrip."""
    spec = get_model("pointnet_cls")
    model = spec.builder(num_class=7)
    pts = jnp.asarray(
        np.random.RandomState(0).randn(2, 128, 3).astype(np.float32))
    variables = _trained_variables(model, (pts,))
    sd = _roundtrip_exact("pointnet_cls", variables)

    canon = CanonPointNetCls(num_class=7).eval()
    _strict_load(canon, sd)
    with torch.no_grad():
        logp_t = canon(torch.from_numpy(np.asarray(pts)))
    np.testing.assert_allclose(
        _flax_eval(model, variables, pts), logp_t.numpy(),
        rtol=1e-4, atol=1e-4)


def test_export_loads_into_canonical_pointnet_sem_seg():
    """The head permutation case: lineage conv1 consumes [global; point],
    ours [point; global] — parity proves _SEMSEG_HEAD_PERM is right."""
    spec = get_model("pointnet_sem_seg")
    model = spec.builder(num_class=13)
    pts = jnp.asarray(
        np.random.RandomState(4).randn(1, 128, 9).astype(np.float32))
    variables = _trained_variables(model, (pts,), nsteps=2)
    sd = _roundtrip_exact("pointnet_sem_seg", variables)

    canon = CanonPointNetSemSeg(num_class=13).eval()
    _strict_load(canon, sd)
    with torch.no_grad():
        logp_t = canon(torch.from_numpy(np.asarray(pts)))
    np.testing.assert_allclose(
        _flax_eval(model, variables, pts), logp_t.numpy(),
        rtol=1e-4, atol=1e-4)


def test_export_loads_into_canonical_pointnet_part_seg():
    """The lineage-skip part-seg variant: head concat order, the
    un-activated bn5, and the double-STN walk against real torch
    modules (closes the one documented migration gap)."""
    spec = get_model("pointnet_part_seg_lineage")
    model = spec.builder()
    rng = np.random.RandomState(5)
    pts = jnp.asarray(rng.randn(2, 96, 3).astype(np.float32))
    onehot = jax.nn.one_hot(jnp.array([4, 9]), 16)
    variables = _trained_variables(model, (pts, onehot), nsteps=1)
    sd = _roundtrip_exact("pointnet_part_seg_lineage", variables)

    canon = CanonPointNetPartSeg().eval()
    _strict_load(canon, sd)
    with torch.no_grad():
        logp_t = canon(torch.from_numpy(np.asarray(pts)),
                       torch.from_numpy(np.asarray(onehot)))
    np.testing.assert_allclose(
        _flax_eval(model, variables, pts, onehot), logp_t.numpy(),
        rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("name", ["pointnet2_sem_seg",
                                  "pointnet2_sem_seg_msg",
                                  "pointnet2_part_seg_msg",
                                  "pointnet2_cls_knn"])
def test_roundtrip_remaining_models(name):
    assert name in SUPPORTED
    spec = get_model(name)
    rng = np.random.RandomState(0)
    if name == "pointnet2_sem_seg":
        model = spec.builder(num_class=13)
        args = (jnp.asarray(rng.randn(1, 128, 9).astype(np.float32)),)
    elif name == "pointnet2_sem_seg_msg":
        model = spec.builder(num_class=13)
        args = (jnp.asarray(rng.randn(1, 512, 9).astype(np.float32)),)
    elif name == "pointnet2_part_seg_msg":
        model = spec.builder()
        args = (jnp.asarray(rng.randn(1, 128, 3).astype(np.float32)),
                jax.nn.one_hot(jnp.array([4]), 16))
    else:
        model = spec.builder(num_class=7)
        args = (jnp.asarray(rng.randn(1, 128, 3).astype(np.float32)),)
    variables = _trained_variables(model, args, nsteps=1)
    _roundtrip_exact(name, variables)


def test_torch_ckpt_cli_eval(tmp_path):
    """A migrated lineage .pth is evaluable straight from the CLI:
    `test.py --torch_ckpt best_model.pth` (no orbax run dir needed).
    Shapes match test_classification_train_smoke for compile-cache hits."""
    import test as test_cli
    spec = get_model("pointnet_cls")
    model = spec.builder(num_class=4)
    pts = jnp.zeros((1, 64, 3), np.float32)
    variables = _trained_variables(model, (pts,), nsteps=0)
    sd = export_state_dict("pointnet_cls", variables)
    path = str(tmp_path / "best_model.pth")
    torch.save({"model_state_dict":
                {k: torch.from_numpy(np.asarray(v).copy())
                 for k, v in sd.items()}}, path)
    ev = test_cli.main([
        "--model", "pointnet_cls", "--log_dir", str(tmp_path / "log"),
        "--npoint", "64", "--num_class", "4", "--batch_size", "8",
        "--test_size", "8", "--torch_ckpt", path])
    assert 0.0 <= ev["instance_acc"] <= 1.0


def test_unsupported_model_raises():
    spec = get_model("pointnet2_cls_ssg")
    model = spec.builder(num_class=3)
    pts = jnp.zeros((1, 64, 3), np.float32)
    variables = _trained_variables(model, (pts,), nsteps=0)
    with pytest.raises(ValueError, match="no canonical torch layout"):
        export_state_dict("fusion_cls", variables)


def test_import_shape_mismatch_raises():
    spec = get_model("pointnet2_cls_ssg")
    model = spec.builder(num_class=3)
    pts = jnp.zeros((1, 64, 3), np.float32)
    variables = _trained_variables(model, (pts,), nsteps=0)
    sd = export_state_dict("pointnet2_cls_ssg", variables)
    sd["fc3.weight"] = np.zeros((9, 256), np.float32)  # wrong num_class
    with pytest.raises(ValueError, match="shape mismatch"):
        import_state_dict("pointnet2_cls_ssg", variables, sd)

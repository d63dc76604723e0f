"""Torch-CPU oracle models (eval-mode) mirroring the mm3d_tpu architectures.

Purpose (SURVEY.md §4.1, BASELINE.json:5 quality gate):
1. logits parity — flax params are transferred in and eval-mode
   log-probabilities must match within fp32 tolerance;
2. the "reference CPU throughput" denominator of the 10x target —
   canonical PointNet++ (+ image fusion) inference on this host's CPU.

Eval-mode only: BatchNorm uses provided running stats, dropout is
identity — exactly the reference's test-time behavior (test_*.py eval
loops, SURVEY.md §3.5).  Structure matches mm3d_tpu/models/* 1:1 so
parameters map name-by-name; geometry ops come from oracle.torch_ops.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from oracle import torch_ops as tops


class EvalBN(nn.Module):
    """BatchNorm over the last axis with fixed running stats (eval only)."""

    def __init__(self, features: int, eps: float = 1e-5):
        super().__init__()
        self.register_buffer("mean", torch.zeros(features))
        self.register_buffer("var", torch.ones(features))
        self.scale = nn.Parameter(torch.ones(features))
        self.bias = nn.Parameter(torch.zeros(features))
        self.eps = eps

    def forward(self, x):
        return (x - self.mean) * torch.rsqrt(self.var + self.eps) \
            * self.scale + self.bias


class SharedMLP(nn.Module):
    def __init__(self, in_features: int, features, last_activation=True):
        super().__init__()
        self.last_activation = last_activation
        layers = []
        bns = []
        for f in features:
            layers.append(nn.Linear(in_features, f))
            bns.append(EvalBN(f))
            in_features = f
        self.dense = nn.ModuleList(layers)
        self.bn = nn.ModuleList(bns)
        self.out_features = in_features

    def forward(self, x):
        n = len(self.dense)
        for i, (d, b) in enumerate(zip(self.dense, self.bn)):
            x = b(d(x))
            if self.last_activation or i + 1 < n:
                x = F.relu(x)
        return x


class STN(nn.Module):
    def __init__(self, in_channels: int, k: int):
        super().__init__()
        self.k = k
        self.mlp = SharedMLP(in_channels, [64, 128, 1024])
        self.fc0 = nn.Linear(1024, 512)
        self.fcbn0 = EvalBN(512)
        self.fc1 = nn.Linear(512, 256)
        self.fcbn1 = EvalBN(256)
        self.fc_out = nn.Linear(256, k * k)

    def forward(self, x):
        h = self.mlp(x).max(dim=1)[0]
        h = F.relu(self.fcbn0(self.fc0(h)))
        h = F.relu(self.fcbn1(self.fc1(h)))
        mat = self.fc_out(h).view(-1, self.k, self.k)
        return mat + torch.eye(self.k)


class PointNetEncoder(nn.Module):
    def __init__(self, global_feat=True, feature_transform=False, channel=3):
        super().__init__()
        self.global_feat = global_feat
        self.feature_transform = feature_transform
        self.stn = STN(channel, 3)
        self.mlp1 = SharedMLP(channel, [64])
        if feature_transform:
            self.fstn = STN(64, 64)
        self.mlp2 = SharedMLP(64, [128])
        self.conv3 = nn.Linear(128, 1024)
        self.bn3 = EvalBN(1024)

    def forward(self, x):
        B, N, C = x.shape
        trans = self.stn(x)
        xyz = torch.bmm(x[..., :3], trans)
        x = torch.cat([xyz, x[..., 3:]], -1) if C > 3 else xyz
        x = self.mlp1(x)
        trans_feat = None
        if self.feature_transform:
            trans_feat = self.fstn(x)
            x = torch.bmm(x, trans_feat)
        point_feat = x
        x = self.bn3(self.conv3(self.mlp2(x)))
        gf = x.max(dim=1)[0]
        if self.global_feat:
            return gf, trans, trans_feat
        tiled = gf.unsqueeze(1).expand(B, N, 1024)
        return torch.cat([point_feat, tiled], -1), trans, trans_feat


class PointNetCls(nn.Module):
    def __init__(self, num_class=40, normal_channel=False):
        super().__init__()
        channel = 6 if normal_channel else 3
        self.channel = channel
        self.feat = PointNetEncoder(True, True, channel)
        self.fc1 = nn.Linear(1024, 512)
        self.bn1 = EvalBN(512)
        self.fc2 = nn.Linear(512, 256)
        self.bn2 = EvalBN(256)
        self.fc3 = nn.Linear(256, num_class)

    def forward(self, points):
        f, trans, trans_feat = self.feat(points[..., :self.channel])
        h = F.relu(self.bn1(self.fc1(f)))
        h = F.relu(self.bn2(self.fc2(h)))  # dropout = identity in eval
        return F.log_softmax(self.fc3(h), dim=-1), trans_feat


class SetAbstraction(nn.Module):
    def __init__(self, npoint, radius, nsample, in_channels, mlp,
                 group_all=False):
        super().__init__()
        self.npoint, self.radius, self.nsample = npoint, radius, nsample
        self.group_all = group_all
        self.mlp = SharedMLP(in_channels, mlp)

    def forward(self, xyz, feats):
        if self.group_all:
            new_xyz, grouped = tops.sample_and_group_all(xyz, feats)
        else:
            new_xyz, grouped = tops.sample_and_group(
                self.npoint, self.radius, self.nsample, xyz, feats)
        return new_xyz, self.mlp(grouped).max(dim=2)[0]


class SetAbstractionMsg(nn.Module):
    def __init__(self, npoint, radius_list, nsample_list, in_channels,
                 mlp_list):
        super().__init__()
        self.npoint = npoint
        self.radius_list = radius_list
        self.nsample_list = nsample_list
        self.mlps = nn.ModuleList(
            [SharedMLP(in_channels + 3, m) for m in mlp_list])

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
            outs.append(self.mlps[i](grouped).max(dim=2)[0])
        return new_xyz, torch.cat(outs, -1)


class FeaturePropagation(nn.Module):
    def __init__(self, in_channels, mlp):
        super().__init__()
        self.mlp = SharedMLP(in_channels, mlp)

    def forward(self, xyz1, xyz2, feats1, feats2):
        B, N, _ = xyz1.shape
        M = xyz2.shape[1]
        if M == 1:
            interpolated = feats2.expand(B, N, feats2.shape[-1])
        else:
            dists, idx = tops.three_nn(xyz1, xyz2)
            weight = tops.interpolation_weights(dists)
            interpolated = tops.three_interpolate(feats2, idx, weight)
        if feats1 is not None:
            interpolated = torch.cat([feats1, interpolated], -1)
        return self.mlp(interpolated)


class PointNet2ClsSSG(nn.Module):
    def __init__(self, num_class=40, normal_channel=False):
        super().__init__()
        self.normal_channel = normal_channel
        in0 = 3 + (3 if normal_channel else 0)
        self.sa1 = SetAbstraction(512, 0.2, 32, in0 + 0, [64, 64, 128])
        self.sa2 = SetAbstraction(128, 0.4, 64, 128 + 3, [128, 128, 256])
        self.sa3 = SetAbstraction(None, None, None, 256 + 3,
                                  [256, 512, 1024], group_all=True)
        self.fc1 = nn.Linear(1024, 512)
        self.bn1 = EvalBN(512)
        self.fc2 = nn.Linear(512, 256)
        self.bn2 = EvalBN(256)
        self.fc3 = nn.Linear(256, num_class)

    def forward(self, points):
        xyz = points[..., :3]
        feats = points[..., 3:6] if self.normal_channel else None
        xyz, f = self.sa1(xyz, feats)
        xyz, f = self.sa2(xyz, f)
        _, f = self.sa3(xyz, f)
        h = f[:, 0]
        h = F.relu(self.bn1(self.fc1(h)))
        h = F.relu(self.bn2(self.fc2(h)))
        return F.log_softmax(self.fc3(h), dim=-1), None


class PointNet2ClsMSG(nn.Module):
    def __init__(self, num_class=40, normal_channel=False):
        super().__init__()
        self.normal_channel = normal_channel
        in0 = 3 if normal_channel else 0
        self.sa1 = SetAbstractionMsg(
            512, [0.1, 0.2, 0.4], [16, 32, 128], in0,
            [[32, 32, 64], [64, 64, 128], [64, 96, 128]])
        self.sa2 = SetAbstractionMsg(
            128, [0.2, 0.4, 0.8], [32, 64, 128], 64 + 128 + 128,
            [[64, 64, 128], [128, 128, 256], [128, 128, 256]])
        self.sa3 = SetAbstraction(None, None, None, 128 + 256 + 256 + 3,
                                  [256, 512, 1024], group_all=True)
        self.fc1 = nn.Linear(1024, 512)
        self.bn1 = EvalBN(512)
        self.fc2 = nn.Linear(512, 256)
        self.bn2 = EvalBN(256)
        self.fc3 = nn.Linear(256, num_class)

    def forward(self, points):
        xyz = points[..., :3]
        feats = points[..., 3:6] if self.normal_channel else None
        xyz, f = self.sa1(xyz, feats)
        xyz, f = self.sa2(xyz, f)
        _, f = self.sa3(xyz, f)
        h = f[:, 0]
        h = F.relu(self.bn1(self.fc1(h)))
        h = F.relu(self.bn2(self.fc2(h)))
        return F.log_softmax(self.fc3(h), dim=-1), None


class PointNet2PartSegSSG(nn.Module):
    """SSG part-seg oracle (exercises the FP/three_interpolate path)."""

    def __init__(self, num_part=50, num_category=16, normal_channel=False):
        super().__init__()
        self.normal_channel = normal_channel
        self.num_category = num_category
        in0 = 6 if normal_channel else 3  # l0_feats = raw points
        # grouped input = 3 (recentered xyz) + l0 feature channels
        self.sa1 = SetAbstraction(512, 0.2, 32,
                                  3 + (in0 if normal_channel else 0),
                                  [64, 64, 128])
        self.sa2 = SetAbstraction(128, 0.4, 64, 128 + 3, [128, 128, 256])
        self.sa3 = SetAbstraction(None, None, None, 256 + 3,
                                  [256, 512, 1024], group_all=True)
        self.fp3 = FeaturePropagation(1024 + 256, [256, 256])
        self.fp2 = FeaturePropagation(256 + 128, [256, 128])
        skip = num_category + 3 + in0
        self.fp1 = FeaturePropagation(128 + skip, [128, 128, 128])
        self.head_mlp = SharedMLP(128, [128])
        self.head_out = nn.Linear(128, num_part)

    def forward(self, points, onehot):
        B, N, _ = points.shape
        l0_xyz = points[..., :3]
        l0_f = points if self.normal_channel else None
        l1_xyz, l1_f = self.sa1(l0_xyz, l0_f)
        l2_xyz, l2_f = self.sa2(l1_xyz, l1_f)
        l3_xyz, l3_f = self.sa3(l2_xyz, l2_f)
        l2_f = self.fp3(l2_xyz, l3_xyz, l2_f, l3_f)
        l1_f = self.fp2(l1_xyz, l2_xyz, l1_f, l2_f)
        cls_tiled = onehot.unsqueeze(1).expand(B, N, self.num_category)
        l0_skip = torch.cat([cls_tiled, l0_xyz, points], -1)
        l0_f = self.fp1(l0_xyz, l1_xyz, l0_skip, l1_f)
        h = self.head_mlp(l0_f)
        return F.log_softmax(self.head_out(h), dim=-1), None


class BasicBlock(nn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.stride = stride
        # stride-2 "SAME" in flax pads asymmetrically (lo=0, hi=1); torch's
        # padding=1 is symmetric, so pad explicitly for stride 2.
        pad1 = 1 if stride == 1 else 0
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, pad1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout).eval()
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout).eval()
        self.proj = None
        if cin != cout or stride != 1:
            self.proj = nn.Conv2d(cin, cout, 1, stride, bias=False)
            self.bn_proj = nn.BatchNorm2d(cout).eval()

    def forward(self, x):
        r = x if self.proj is None else self.bn_proj(self.proj(x))
        if self.stride == 1:
            xin = x
        else:
            # flax SAME padding for 3x3 stride-2: total = max((ceil(H/s)
            # -1)*s + 3 - H, 0), split lo = total//2 (asymmetric (0,1)
            # for even sizes, symmetric (1,1) for odd — a fixed
            # (0,1,0,1) silently shifts odd-size feature maps)
            h, w = x.shape[-2], x.shape[-1]
            ph = max((-(-h // 2) - 1) * 2 + 3 - h, 0)
            pw = max((-(-w // 2) - 1) * 2 + 3 - w, 0)
            xin = F.pad(x, (pw // 2, pw - pw // 2, ph // 2, ph - ph // 2))
        y = F.relu(self.bn1(self.conv1(xin)))
        y = self.bn2(self.conv2(y))
        return F.relu(y + r)


class ImageEncoder(nn.Module):
    """NCHW twin of mm3d_tpu.models.image.ImageEncoder."""

    def __init__(self, stage_features=(32, 64, 128), blocks_per_stage=2,
                 global_features=512):
        super().__init__()
        self.stem = nn.Conv2d(3, stage_features[0], 3, 1, 1, bias=False)
        self.stem_bn = nn.BatchNorm2d(stage_features[0]).eval()
        blocks = []
        cin = stage_features[0]
        for s, f in enumerate(stage_features):
            stride = 1 if s == 0 else 2
            blocks.append(BasicBlock(cin, f, stride))
            for _ in range(1, blocks_per_stage):
                blocks.append(BasicBlock(f, f, 1))
            cin = f
        self.blocks = nn.Sequential(*blocks)
        self.fc_glob = nn.Linear(stage_features[-1], global_features)

    def forward(self, img_nhwc):
        x = img_nhwc.permute(0, 3, 1, 2)
        x = F.relu(self.stem_bn(self.stem(x)))
        fmap = self.blocks(x)
        gap = fmap.mean(dim=(2, 3))
        return fmap, F.relu(self.fc_glob(gap))


class FusionCls(nn.Module):
    """Late-fusion multimodal classifier (config 4 oracle)."""

    def __init__(self, num_class=40):
        super().__init__()
        in0 = 3
        self.sa1 = SetAbstraction(512, 0.2, 32, in0, [64, 64, 128])
        self.sa2 = SetAbstraction(128, 0.4, 64, 128 + 3, [128, 128, 256])
        self.sa3 = SetAbstraction(None, None, None, 256 + 3,
                                  [256, 512, 1024], group_all=True)
        self.image = ImageEncoder()
        self.fc1 = nn.Linear(1024 + 512, 512)
        self.bn1 = EvalBN(512)
        self.fc2 = nn.Linear(512, 256)
        self.bn2 = EvalBN(256)
        self.fc3 = nn.Linear(256, num_class)

    def forward(self, points, image, K=None, R=None, t=None):
        xyz = points[..., :3]
        xyz, f = self.sa1(xyz, None)
        xyz, f = self.sa2(xyz, f)
        _, f = self.sa3(xyz, f)
        pf = f[:, 0]
        _, imgf = self.image(image)
        h = torch.cat([pf, imgf], -1)
        h = F.relu(self.bn1(self.fc1(h)))
        h = F.relu(self.bn2(self.fc2(h)))
        return F.log_softmax(self.fc3(h), dim=-1), None


class FusionSemSeg(nn.Module):
    """Config 5 oracle: per-point fusion semseg (concat head).

    Mirrors mm3d_tpu.models.fusion.FusionSemSeg: dense point trunk
    (SA x2 + FP x2), image CNN, point->pixel projection + bilinear
    sampling (zero padding, pixel-center coords, stride-4 map).
    """

    def __init__(self, num_class=13, in_channels=9, image_stride=4):
        super().__init__()
        self.image_stride = image_stride
        self.sa1 = SetAbstraction(256, 0.2, 32, 3 + in_channels,
                                  [64, 64, 128])
        self.sa2 = SetAbstraction(64, 0.4, 64, 128 + 3, [128, 128, 256])
        self.fp2 = FeaturePropagation(256 + 128, [256, 128])
        self.fp1 = FeaturePropagation(128 + in_channels, [128, 128])
        self.image = ImageEncoder()
        self.head_mlp = SharedMLP(128 + 128, [128])
        self.head_out = nn.Linear(128, num_class)

    @staticmethod
    def _bilinear(feat_nchw, uv, H, W):
        # zero-padded bilinear at pixel coords (matches ops.projection)
        B, C, Hf, Wf = feat_nchw.shape
        u, v = uv[..., 0], uv[..., 1]
        x0 = torch.floor(u); y0 = torch.floor(v)
        du = (u - x0).unsqueeze(-1); dv = (v - y0).unsqueeze(-1)
        x0 = x0.long(); y0 = y0.long()
        flat = feat_nchw.permute(0, 2, 3, 1).reshape(B, Hf * Wf, C)

        def corner(xi, yi):
            inside = ((xi >= 0) & (xi < Wf) & (yi >= 0) & (yi < Hf))
            idx = (yi.clamp(0, Hf - 1) * Wf + xi.clamp(0, Wf - 1))
            vals = torch.gather(
                flat, 1, idx.unsqueeze(-1).expand(-1, -1, C))
            return vals * inside.unsqueeze(-1).float()

        c00 = corner(x0, y0); c10 = corner(x0 + 1, y0)
        c01 = corner(x0, y0 + 1); c11 = corner(x0 + 1, y0 + 1)
        top = c00 * (1 - du) + c10 * du
        bot = c01 * (1 - du) + c11 * du
        return top * (1 - dv) + bot * dv

    def forward(self, points, image, K, R, t):
        xyz = points[..., :3]
        l1_xyz, l1_f = self.sa1(xyz, points)
        l2_xyz, l2_f = self.sa2(l1_xyz, l1_f)
        l1_f = self.fp2(l1_xyz, l2_xyz, l1_f, l2_f)
        pf = self.fp1(xyz, l1_xyz, points, l1_f)
        fmap, _ = self.image(image)
        H, W = image.shape[1], image.shape[2]
        cam = torch.einsum("bij,bnj->bni", R, xyz) + t.unsqueeze(1)
        z = cam[..., 2]
        safe_z = torch.where(z.abs() < 1e-6, torch.full_like(z, 1e-6), z)
        u = K[:, None, 0, 0] * cam[..., 0] / safe_z + K[:, None, 0, 2]
        v = K[:, None, 1, 1] * cam[..., 1] / safe_z + K[:, None, 1, 2]
        uv = torch.stack([u, v], -1)
        valid = ((z > 0) & (u >= 0) & (u <= W - 1)
                 & (v >= 0) & (v <= H - 1))
        pixf = self._bilinear(fmap, uv / self.image_stride, H, W)
        pixf = pixf * valid.unsqueeze(-1).float()
        fused = torch.cat([pf, pixf], -1)
        h = self.head_mlp(fused)
        return F.log_softmax(self.head_out(h), dim=-1), None


# ------------------------------------------------------- weight transfer


def _t(a):
    return torch.from_numpy(np.array(a, copy=True))


def load_shared_mlp(dst: SharedMLP, params, stats):
    for i in range(len(dst.dense)):
        d = params[f"dense_{i}"]
        dst.dense[i].weight.data = _t(d["kernel"]).T.contiguous()
        dst.dense[i].bias.data = _t(d["bias"])
        b = params[f"bn_{i}"]
        dst.bn[i].scale.data = _t(b["scale"])
        dst.bn[i].bias.data = _t(b["bias"])
        s = stats[f"bn_{i}"]
        dst.bn[i].mean = _t(s["mean"])
        dst.bn[i].var = _t(s["var"])


def load_stn(dst: STN, params, stats):
    load_shared_mlp(dst.mlp, params["mlp"], stats["mlp"])
    for i, (fc, bn) in enumerate([(dst.fc0, dst.fcbn0), (dst.fc1, dst.fcbn1)]):
        fc.weight.data = _t(params[f"fc_{i}"]["kernel"]).T.contiguous()
        fc.bias.data = _t(params[f"fc_{i}"]["bias"])
        bn.scale.data = _t(params[f"fcbn_{i}"]["scale"])
        bn.bias.data = _t(params[f"fcbn_{i}"]["bias"])
        bn.mean = _t(stats[f"fcbn_{i}"]["mean"])
        bn.var = _t(stats[f"fcbn_{i}"]["var"])
    dst.fc_out.weight.data = _t(params["fc_out"]["kernel"]).T.contiguous()
    dst.fc_out.bias.data = _t(params["fc_out"]["bias"])


def _load_fc_bn(fc, bn, params, stats, fc_name, bn_name):
    fc.weight.data = _t(params[fc_name]["kernel"]).T.contiguous()
    fc.bias.data = _t(params[fc_name]["bias"])
    bn.scale.data = _t(params[bn_name]["scale"])
    bn.bias.data = _t(params[bn_name]["bias"])
    bn.mean = _t(stats[bn_name]["mean"])
    bn.var = _t(stats[bn_name]["var"])


def load_pointnet_cls(dst: PointNetCls, variables):
    p, s = variables["params"], variables["batch_stats"]
    fp, fs = p["feat"], s["feat"]
    load_stn(dst.feat.stn, fp["stn"], fs["stn"])
    load_stn(dst.feat.fstn, fp["fstn"], fs["fstn"])
    load_shared_mlp(dst.feat.mlp1, fp["mlp1"], fs["mlp1"])
    load_shared_mlp(dst.feat.mlp2, fp["mlp2"], fs["mlp2"])
    dst.feat.conv3.weight.data = _t(fp["conv3"]["kernel"]).T.contiguous()
    dst.feat.conv3.bias.data = _t(fp["conv3"]["bias"])
    dst.feat.bn3.scale.data = _t(fp["bn3"]["scale"])
    dst.feat.bn3.bias.data = _t(fp["bn3"]["bias"])
    dst.feat.bn3.mean = _t(fs["bn3"]["mean"])
    dst.feat.bn3.var = _t(fs["bn3"]["var"])
    _load_fc_bn(dst.fc1, dst.bn1, p, s, "fc1", "bn1")
    _load_fc_bn(dst.fc2, dst.bn2, p, s, "fc2", "bn2")
    dst.fc3.weight.data = _t(p["fc3"]["kernel"]).T.contiguous()
    dst.fc3.bias.data = _t(p["fc3"]["bias"])


def _load_mlp_block(mlp: SharedMLP, params, stats, suffix=""):
    """Load a SharedMLP from either the plain (mlp/dense_i) or the
    project-first (proj_kernel/proj_bn + mlp_rest) flax layout — the
    torch oracle always computes the canonical grouped form."""
    pk, pb, pbn = (f"proj_kernel{suffix}", f"proj_bias{suffix}",
                   f"proj_bn{suffix}")
    if pk not in params:
        key = "mlp" if suffix == "" else f"mlp{suffix}"
        load_shared_mlp(mlp, params[key], stats[key])
        return
    mlp.dense[0].weight.data = _t(params[pk]).T.contiguous()
    mlp.dense[0].bias.data = _t(params[pb])
    mlp.bn[0].scale.data = _t(params[pbn]["scale"])
    mlp.bn[0].bias.data = _t(params[pbn]["bias"])
    mlp.bn[0].mean = _t(stats[pbn]["mean"])
    mlp.bn[0].var = _t(stats[pbn]["var"])
    rest_key = f"mlp_rest{suffix}"
    if rest_key in params:
        rest_p, rest_s = params[rest_key], stats[rest_key]
        for i in range(len(mlp.dense) - 1):
            d = rest_p[f"dense_{i}"]
            mlp.dense[i + 1].weight.data = _t(d["kernel"]).T.contiguous()
            mlp.dense[i + 1].bias.data = _t(d["bias"])
            b = rest_p[f"bn_{i}"]
            mlp.bn[i + 1].scale.data = _t(b["scale"])
            mlp.bn[i + 1].bias.data = _t(b["bias"])
            st = rest_s[f"bn_{i}"]
            mlp.bn[i + 1].mean = _t(st["mean"])
            mlp.bn[i + 1].var = _t(st["var"])


def load_sa(sa, params, stats):
    _load_mlp_block(sa.mlp, params, stats)


def load_sa_msg(sa: SetAbstractionMsg, params, stats):
    for i in range(len(sa.mlps)):
        _load_mlp_block(sa.mlps[i], params, stats, suffix=f"_{i}")


def load_fp(fp: FeaturePropagation, params, stats):
    _load_mlp_block(fp.mlp, params, stats)


def load_pointnet2_cls_ssg(dst: PointNet2ClsSSG, variables):
    p, s = variables["params"], variables["batch_stats"]
    for name, sa in (("sa1", dst.sa1), ("sa2", dst.sa2), ("sa3", dst.sa3)):
        load_sa(sa, p[name], s[name])
    _load_fc_bn(dst.fc1, dst.bn1, p, s, "fc1", "bn1")
    _load_fc_bn(dst.fc2, dst.bn2, p, s, "fc2", "bn2")
    dst.fc3.weight.data = _t(p["fc3"]["kernel"]).T.contiguous()
    dst.fc3.bias.data = _t(p["fc3"]["bias"])


def load_pointnet2_cls_msg(dst: PointNet2ClsMSG, variables):
    p, s = variables["params"], variables["batch_stats"]
    load_sa_msg(dst.sa1, p["sa1"], s["sa1"])
    load_sa_msg(dst.sa2, p["sa2"], s["sa2"])
    load_sa(dst.sa3, p["sa3"], s["sa3"])
    _load_fc_bn(dst.fc1, dst.bn1, p, s, "fc1", "bn1")
    _load_fc_bn(dst.fc2, dst.bn2, p, s, "fc2", "bn2")
    dst.fc3.weight.data = _t(p["fc3"]["kernel"]).T.contiguous()
    dst.fc3.bias.data = _t(p["fc3"]["bias"])


def _load_conv(conv: nn.Conv2d, kernel):
    # flax NHWC kernel [h,w,in,out] -> torch [out,in,h,w]
    conv.weight.data = _t(kernel).permute(3, 2, 0, 1).contiguous()


def _load_bn2d(bn: nn.BatchNorm2d, params, stats):
    bn.weight.data = _t(params["scale"])
    bn.bias.data = _t(params["bias"])
    bn.running_mean = _t(stats["mean"])
    bn.running_var = _t(stats["var"])


def load_image_encoder(dst: ImageEncoder, params, stats):
    _load_conv(dst.stem, params["stem"]["kernel"])
    _load_bn2d(dst.stem_bn, params["stem_bn"], stats["stem_bn"])
    i = 0
    for s in range(3):
        for b in range(2):
            name = f"s{s}b{b}"
            blk = dst.blocks[i]; i += 1
            _load_conv(blk.conv1, params[name]["conv1"]["kernel"])
            _load_bn2d(blk.bn1, params[name]["bn1"], stats[name]["bn1"])
            _load_conv(blk.conv2, params[name]["conv2"]["kernel"])
            _load_bn2d(blk.bn2, params[name]["bn2"], stats[name]["bn2"])
            if blk.proj is not None:
                _load_conv(blk.proj, params[name]["proj"]["kernel"])
                _load_bn2d(blk.bn_proj, params[name]["bn_proj"],
                           stats[name]["bn_proj"])
    if "fc_glob" in params:  # per-point fusion drops the global head
        dst.fc_glob.weight.data = _t(
            params["fc_glob"]["kernel"]).T.contiguous()
        dst.fc_glob.bias.data = _t(params["fc_glob"]["bias"])


def load_fusion_cls(dst: FusionCls, variables):
    p, s = variables["params"], variables["batch_stats"]
    pt, st_ = p["point_trunk"], s["point_trunk"]
    for name, sa in (("sa1", dst.sa1), ("sa2", dst.sa2), ("sa3", dst.sa3)):
        load_sa(sa, pt[name], st_[name])
    load_image_encoder(dst.image, p["image_trunk"], s["image_trunk"])
    _load_fc_bn(dst.fc1, dst.bn1, p, s, "fc1", "bn1")
    _load_fc_bn(dst.fc2, dst.bn2, p, s, "fc2", "bn2")
    dst.fc3.weight.data = _t(p["fc3"]["kernel"]).T.contiguous()
    dst.fc3.bias.data = _t(p["fc3"]["bias"])


def load_fusion_semseg(dst: FusionSemSeg, variables):
    p, s = variables["params"], variables["batch_stats"]
    pt, st_ = p["point_trunk"], s["point_trunk"]
    for name, blk in (("sa1", dst.sa1), ("sa2", dst.sa2)):
        load_sa(blk, pt[name], st_[name])
    for name, blk in (("fp2", dst.fp2), ("fp1", dst.fp1)):
        load_fp(blk, pt[name], st_[name])
    load_image_encoder(dst.image, p["image_trunk"], s["image_trunk"])
    load_shared_mlp(dst.head_mlp, p["head_mlp"], s["head_mlp"])
    dst.head_out.weight.data = _t(p["head_out"]["kernel"]).T.contiguous()
    dst.head_out.bias.data = _t(p["head_out"]["bias"])


def load_pointnet2_part_seg_ssg(dst: PointNet2PartSegSSG, variables):
    p, s = variables["params"], variables["batch_stats"]
    for name, sa in (("sa1", dst.sa1), ("sa2", dst.sa2), ("sa3", dst.sa3)):
        load_sa(sa, p[name], s[name])
    for name, fp in (("fp3", dst.fp3), ("fp2", dst.fp2), ("fp1", dst.fp1)):
        load_fp(fp, p[name], s[name])
    load_shared_mlp(dst.head_mlp, p["head_mlp"], s["head_mlp"])
    dst.head_out.weight.data = _t(p["head_out"]["kernel"]).T.contiguous()
    dst.head_out.bias.data = _t(p["head_out"]["bias"])

"""Multimodal point+image fusion models (configs 4-5, BASELINE.json:10-11).

Late fusion for classification (global point feature ⊕ global image
feature) and per-point fusion for segmentation (point features ⊕
projected-and-bilinearly-sampled pixel features), each with 'concat' and
'attention' fusion heads (SURVEY.md §3.4).  Everything runs on device in
one jitted stage: CNN, projection, sampling, fusion, head — no host
round-trips (BASELINE.json:5).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from mm3d_tpu.models.image import ImageEncoder
from mm3d_tpu.models.layers import BatchNorm, SharedMLP, log_softmax_head
from mm3d_tpu.models.pointnet2 import (FeaturePropagation, SetAbstraction)
from mm3d_tpu.ops import projection as proj


class PointTrunkCls(nn.Module):
    """PointNet++ SSG trunk -> [B, 1024] global feature."""

    dtype: object = None

    @nn.compact
    def __call__(self, xyz, feats=None, train: bool = True,
                 bn_momentum: float = 0.1):
        xyz, f = SetAbstraction(512, 0.2, 32, (64, 64, 128), name="sa1",
                                dtype=self.dtype)(xyz, feats, train,
                                                  bn_momentum)
        xyz, f = SetAbstraction(128, 0.4, 64, (128, 128, 256), name="sa2",
                                dtype=self.dtype)(xyz, f, train, bn_momentum)
        _, f = SetAbstraction(mlp=(256, 512, 1024), group_all=True,
                              name="sa3", dtype=self.dtype)(
                                  xyz, f, train, bn_momentum)
        return f[:, 0]


class PointTrunkDense(nn.Module):
    """SA×2 down + FP×2 up -> [B, N, 128] per-point features."""

    dtype: object = None

    @nn.compact
    def __call__(self, xyz, feats=None, train: bool = True,
                 bn_momentum: float = 0.1):
        l1_xyz, l1_f = SetAbstraction(256, 0.2, 32, (64, 64, 128),
                                      name="sa1",
                                      # raw mixed-scale block features —
                                      # same bf16-train hole as semseg
                                      # sa1 (see SetAbstraction)
                                      f32_train_guard=True,
                                      dtype=self.dtype)(
                                          xyz, feats, train, bn_momentum)
        l2_xyz, l2_f = SetAbstraction(64, 0.4, 64, (128, 128, 256),
                                      name="sa2", dtype=self.dtype)(
                                          l1_xyz, l1_f, train, bn_momentum)
        l1_f = FeaturePropagation((256, 128), name="fp2",
                                  dtype=self.dtype)(
            l1_xyz, l2_xyz, l1_f, l2_f, train, bn_momentum)
        l0_f = FeaturePropagation((128, 128), name="fp1",
                                  dtype=self.dtype)(
            xyz, l1_xyz, feats, l1_f, train, bn_momentum)
        return l0_f


class AttentionFusion(nn.Module):
    """Learned softmax gate over modalities projected to a common width."""

    features: int = 256
    dtype: object = None  # matches the surrounding trunks' compute dtype

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array]):
        projected = [nn.Dense(self.features, name=f"proj_{i}",
                              dtype=self.dtype)(f)
                     for i, f in enumerate(feats)]
        scores = [nn.Dense(1, name=f"score_{i}",
                           dtype=self.dtype)(jnp.tanh(p))
                  for i, p in enumerate(projected)]
        alpha = jax.nn.softmax(jnp.concatenate(scores, axis=-1), axis=-1)
        stacked = jnp.stack(projected, axis=-1)  # [..., F, M]
        fused = jnp.sum(stacked * alpha[..., None, :], axis=-1)
        return fused, alpha


class FusionCls(nn.Module):
    """Config 4: image+point late-fusion classification."""

    num_class: int = 40
    fusion: str = "concat"  # concat | attention
    normal_channel: bool = False
    dtype: object = None  # bf16 inference mode (geometry stays f32)

    @nn.compact
    def __call__(self, points, image, K, R, t, train: bool = True,
                 bn_momentum: float = 0.1, deterministic: Optional[bool] = None):
        det = (not train) if deterministic is None else deterministic
        xyz = points[..., :3]
        feats = points[..., 3:6] if self.normal_channel else None
        pf = PointTrunkCls(name="point_trunk", dtype=self.dtype)(
            xyz, feats, train, bn_momentum)
        _, imgf = ImageEncoder(name="image_trunk", dtype=self.dtype)(
            image.astype(self.dtype or image.dtype), train, bn_momentum)
        aux = {"trans_feat": None}
        if self.fusion == "attention":
            fused, alpha = AttentionFusion(256, name="fuse", dtype=self.dtype)([pf, imgf])
            aux["fusion_alpha"] = alpha
        else:
            fused = jnp.concatenate([pf, imgf], axis=-1)
        h = nn.Dense(512, name="fc1", dtype=self.dtype)(fused)
        h = BatchNorm(name="bn1", dtype=self.dtype)(
            h, use_running_average=not train, momentum=bn_momentum)
        h = nn.relu(h)
        h = nn.Dropout(0.4, deterministic=det, name="drop1")(h)
        h = nn.Dense(256, name="fc2", dtype=self.dtype)(h)
        h = BatchNorm(name="bn2", dtype=self.dtype)(
            h, use_running_average=not train, momentum=bn_momentum)
        h = nn.relu(h)
        h = nn.Dropout(0.4, deterministic=det, name="drop2")(h)
        h = nn.Dense(self.num_class, name="fc3", dtype=self.dtype)(h)
        return log_softmax_head(h.astype(jnp.float32)), aux


class FusionSemSeg(nn.Module):
    """Config 5: per-point semantic segmentation with point<->pixel fusion.

    Points project into the image; pixel features are bilinearly sampled
    from the CNN's stride-4 map and fused per point with the point-trunk
    features ('concat' or 'attention'), then a shared-MLP head predicts
    per-point classes.
    """

    num_class: int = 13
    fusion: str = "concat"
    image_stride: int = 4
    dtype: object = None  # bf16 serving/mixed-precision mode

    @nn.compact
    def __call__(self, points, image, K, R, t, train: bool = True,
                 bn_momentum: float = 0.1, deterministic: Optional[bool] = None):
        det = (not train) if deterministic is None else deterministic
        xyz = points[..., :3]
        pf = PointTrunkDense(name="point_trunk", dtype=self.dtype)(
            xyz, points, train, bn_momentum)  # [B,N,128]
        fmap, _ = ImageEncoder(name="image_trunk", include_global=False,
                               dtype=self.dtype)(
            image.astype(self.dtype or image.dtype), train, bn_momentum)
        H, W = image.shape[1], image.shape[2]
        # trace-time guard: image_stride is an independent knob that
        # must match the encoder's ACTUAL downsampling — a desync scales
        # uv by the wrong factor and points silently sample wrong
        # pixels with no shape error (code-review r5)
        if H // self.image_stride != fmap.shape[1]:
            raise ValueError(
                f"image_stride={self.image_stride} disagrees with the "
                f"encoder: image H={H} -> fmap H={fmap.shape[1]} "
                f"(expected {H // self.image_stride})")
        pixf, valid = proj.sample_image_features(
            fmap, xyz, K, R, t, (H, W), stride=self.image_stride)
        aux = {"trans_feat": None, "proj_valid": valid}
        if self.fusion == "attention":
            fused, alpha = AttentionFusion(
                128, name="fuse", dtype=self.dtype)([pf, pixf])
            aux["fusion_alpha"] = alpha
        else:
            fused = jnp.concatenate([pf, pixf], axis=-1)
        h = SharedMLP([128], name="head_mlp", dtype=self.dtype)(
            fused, train, bn_momentum)
        h = nn.Dropout(0.5, deterministic=det, name="drop")(h)
        h = nn.Dense(self.num_class, name="head_out", dtype=self.dtype)(h)
        return log_softmax_head(h.astype(jnp.float32)), aux

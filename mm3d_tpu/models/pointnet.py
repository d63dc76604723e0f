"""PointNet model family (Flax, channels-last).

Re-designed from the lineage's `pointnet_utils.py` / `pointnet_cls.py` /
`pointnet_part_seg.py` / `pointnet_sem_seg.py` structure (SURVEY.md §2.3;
reference mount empty, spec from BASELINE.json:5,7): STN alignment nets,
shared-MLP encoder with max-pool symmetric aggregation, classification /
part-seg / sem-seg heads returning log-probabilities, and the NLL +
orthogonality-regularizer losses.

All tensors are channels-last [B, N, C]; every "Conv1d(k=1)" of the torch
original is a Dense over the channel axis (one MXU matmul).

bf16 mode (``dtype=jnp.bfloat16``): network compute in bf16 with f32
params (mixed precision).  Two f32 islands, mirroring the PN++ lessons
(BASELINE.md r2 notes): the STN alignment *matrix* is produced and
applied to the xyz coordinates in f32 (a bf16 3x3 product destroys the
sub-unit coordinate detail the whole network keys on), and BN statistics
always accumulate in f32 (models/layers.py).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mm3d_tpu.models.layers import guarded_train_dtype, BatchNorm, SharedMLP, log_softmax_head


class STN(nn.Module):
    """Spatial transformer: predicts a k x k alignment matrix (STN3d/STNkd).

    The predicted matrix is always returned in f32 (zero-init head +
    identity): in bf16 mode the *features* feeding it are bf16 but the
    alignment map itself stays full precision.
    """

    k: int = 3
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, x, train: bool = True, bn_momentum: float = 0.1):
        # x: [B, N, C_in]
        if self.dtype is not None:
            x = x.astype(self.dtype)
        h = SharedMLP([64, 128, 1024], name="mlp", dtype=self.dtype)(
            x, train, bn_momentum)
        h = jnp.max(h, axis=1)  # [B, 1024]
        for i, f in enumerate((512, 256)):
            h = nn.Dense(f, name=f"fc_{i}", dtype=self.dtype)(h)
            h = BatchNorm(name=f"fcbn_{i}", dtype=self.dtype)(
                h, use_running_average=not train, momentum=bn_momentum)
            h = nn.relu(h)
        # zero-init final layer + additive identity => starts at identity;
        # dtype=None => f32 params promote the bf16 input, so `mat` is f32
        mat = nn.Dense(self.k * self.k, name="fc_out",
                       kernel_init=nn.initializers.zeros,
                       bias_init=nn.initializers.zeros)(
                           h.astype(jnp.float32))
        mat = mat.reshape(-1, self.k, self.k) + jnp.eye(self.k,
                                                        dtype=mat.dtype)
        return mat



def _stn_align(x, trans, dtype):
    """Apply the 3x3 STN to the xyz channels in f32 at HIGHEST matmul
    precision (the default TPU bf16 pass would destroy the sub-unit
    coordinate detail this f32 island exists to protect — same rule as
    geometry.square_distance / augment's rotation), then cast back and
    re-attach the extra channels."""
    xyz = jnp.einsum("bnc,bcd->bnd", x[..., :3].astype(jnp.float32),
                     trans, precision=jax.lax.Precision.HIGHEST)
    if x.shape[-1] > 3:
        x = jnp.concatenate([xyz.astype(x.dtype), x[..., 3:]], axis=-1)
    else:
        x = xyz.astype(x.dtype)
    return x.astype(dtype) if dtype is not None else x

class PointNetEncoder(nn.Module):
    """Shared-MLP encoder with optional input/feature STNs.

    Returns (global_feat [B,1024] or per-point concat [B,N,1088],
    trans [B,3,3], trans_feat [B,64,64] or None).
    """

    global_feat: bool = True
    feature_transform: bool = False
    channel: int = 3
    dtype: Optional[object] = None
    # First-contact layer stays f32 during bf16 TRAINING: mirrors the
    # measured PN++ semseg guard (mm3d_tpu/models/pointnet2.py
    # SetAbstraction.f32_train_guard) for raw mixed-scale inputs whose
    # room-scale absolute channels drown local geometry under bf16
    # rounding.  Serving stays bf16.
    f32_train_guard: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True, bn_momentum: float = 0.1):
        B, N, _ = x.shape
        if x.shape[-1] != self.channel:
            raise ValueError(
                f"PointNetEncoder(channel={self.channel}) got "
                f"{x.shape[-1]}-channel input")
        dt = guarded_train_dtype(self.dtype, train, self.f32_train_guard)
        # the STN consumes the same raw first-contact features the
        # guard protects — keep it inside the f32 island in bf16 TRAIN
        # (serving stays bf16; code-review r5)
        trans = STN(k=3, name="stn", dtype=dt)(x, train, bn_momentum)
        x = _stn_align(x, trans, dt)
        x = SharedMLP([64], name="mlp1", dtype=dt)(
            x, train, bn_momentum)
        trans_feat = None
        if self.feature_transform:
            trans_feat = STN(k=64, name="fstn", dtype=self.dtype)(
                x, train, bn_momentum)
            x = jnp.einsum("bnc,bcd->bnd", x,
                           trans_feat.astype(x.dtype))
        point_feat = x
        x = SharedMLP([128], name="mlp2", dtype=self.dtype)(
            x, train, bn_momentum)
        x = nn.Dense(1024, name="conv3", dtype=self.dtype)(x)
        x = BatchNorm(name="bn3", dtype=self.dtype)(
            x, use_running_average=not train, momentum=bn_momentum)
        gf = jnp.max(x, axis=1)  # [B,1024]
        if self.global_feat:
            return gf, trans, trans_feat
        tiled = jnp.broadcast_to(gf[:, None, :], (B, N, 1024))
        return jnp.concatenate([point_feat, tiled], -1), trans, trans_feat


class PointNetCls(nn.Module):
    """Config 1 (BASELINE.json:7): PointNet classification."""

    num_class: int = 40
    normal_channel: bool = False
    dtype: Optional[object] = None  # bf16 serving/mixed-precision mode

    @nn.compact
    def __call__(self, points, train: bool = True, bn_momentum: float = 0.1,
                 deterministic: Optional[bool] = None):
        det = (not train) if deterministic is None else deterministic
        channel = 6 if self.normal_channel else 3
        feat, trans, trans_feat = PointNetEncoder(
            global_feat=True, feature_transform=True, channel=channel,
            name="feat", dtype=self.dtype)(points[..., :channel], train,
                                           bn_momentum)
        x = nn.Dense(512, name="fc1", dtype=self.dtype)(feat)
        x = BatchNorm(name="bn1", dtype=self.dtype)(
            x, use_running_average=not train, momentum=bn_momentum)
        x = nn.relu(x)
        x = nn.Dense(256, name="fc2", dtype=self.dtype)(x)
        x = nn.Dropout(0.4, deterministic=det, name="drop")(x)
        x = BatchNorm(name="bn2", dtype=self.dtype)(
            x, use_running_average=not train, momentum=bn_momentum)
        x = nn.relu(x)
        x = nn.Dense(self.num_class, name="fc3", dtype=self.dtype)(x)
        return log_softmax_head(x.astype(jnp.float32)), \
            {"trans_feat": trans_feat}


class PointNetPartSeg(nn.Module):
    """PointNet part segmentation: per-point 50-way logits with one-hot
    category conditioning (SURVEY.md §2.3)."""

    num_part: int = 50
    num_category: int = 16
    normal_channel: bool = False
    dtype: Optional[object] = None  # bf16 serving/mixed-precision mode

    @nn.compact
    def __call__(self, points, cls_label_onehot, train: bool = True,
                 bn_momentum: float = 0.1):
        B, N, _ = points.shape
        channel = 6 if self.normal_channel else 3
        x = points[..., :channel]
        trans = STN(k=3, name="stn", dtype=self.dtype)(x, train, bn_momentum)
        x = _stn_align(x, trans, self.dtype)
        out1 = SharedMLP([64, 128, 128], name="mlp1", dtype=self.dtype)(
            x, train, bn_momentum)
        trans_feat = STN(k=128, name="fstn", dtype=self.dtype)(
            out1, train, bn_momentum)
        net = jnp.einsum("bnc,bcd->bnd", out1, trans_feat.astype(out1.dtype))
        out2 = SharedMLP([512], name="mlp2", dtype=self.dtype)(
            net, train, bn_momentum)
        out3 = nn.Dense(2048, name="conv3", dtype=self.dtype)(out2)
        out3 = BatchNorm(name="bn3", dtype=self.dtype)(
            out3, use_running_average=not train, momentum=bn_momentum)
        gf = jnp.max(out3, axis=1)  # [B,2048]
        gf = jnp.concatenate([gf, cls_label_onehot.astype(gf.dtype)], -1)
        tiled = jnp.broadcast_to(
            gf[:, None, :], (B, N, gf.shape[-1]))
        concat = jnp.concatenate([tiled, out1, net, out2, out3], -1)
        h = SharedMLP([256, 256, 128], name="head_mlp", dtype=self.dtype)(
            concat, train, bn_momentum)
        h = nn.Dense(self.num_part, name="head_out", dtype=self.dtype)(h)
        return log_softmax_head(h.astype(jnp.float32)), \
            {"trans_feat": trans_feat}


class PointNetPartSegLineage(nn.Module):
    """Lineage-faithful PointNet part segmentation (checkpoint-compatible).

    Our default :class:`PointNetPartSeg` redesigned the head's skip set
    (it feeds the transformed features instead of the conv1/conv2
    intermediates), which makes canonical ``.pth`` checkpoints
    unmappable onto it.  This variant reproduces the public lineage's
    exact dataflow — head input ``[global+label(2064); out1(64);
    out2(128); out3(128); out4(512); out5(2048)] = 4944`` channels,
    ``bn5`` with **no** ReLU before the global max — so a lineage user's
    trained part-seg checkpoint migrates 1:1
    (``mm3d_tpu.utils.torch_import``, model name
    ``pointnet_part_seg_lineage``).  Param names mirror the canonical
    module names (conv1..conv5/bn1..bn5, convs1..convs4/bns1..bns3) to
    keep the import walk a direct rename.
    """

    num_part: int = 50
    num_category: int = 16
    normal_channel: bool = False
    dtype: Optional[object] = None  # bf16 serving/mixed-precision mode

    @nn.compact
    def __call__(self, points, cls_label_onehot, train: bool = True,
                 bn_momentum: float = 0.1):
        B, N, _ = points.shape
        channel = 6 if self.normal_channel else 3
        x = points[..., :channel]
        trans = STN(k=3, name="stn", dtype=self.dtype)(x, train, bn_momentum)
        x = _stn_align(x, trans, self.dtype)

        def conv_bn(h, f, i, act=True):
            h = nn.Dense(f, name=f"conv{i}", dtype=self.dtype)(h)
            h = BatchNorm(name=f"bn{i}", dtype=self.dtype)(
                h, use_running_average=not train, momentum=bn_momentum)
            return nn.relu(h) if act else h

        out1 = conv_bn(x, 64, 1)
        out2 = conv_bn(out1, 128, 2)
        out3 = conv_bn(out2, 128, 3)
        trans_feat = STN(k=128, name="fstn", dtype=self.dtype)(
            out3, train, bn_momentum)
        net = jnp.einsum("bnc,bcd->bnd", out3, trans_feat.astype(out3.dtype))
        out4 = conv_bn(net, 512, 4)
        # lineage: out5 = bn5(conv5(out4)) with NO activation — the global
        # max runs over the raw-normalized features
        out5 = conv_bn(out4, 2048, 5, act=False)
        gf = jnp.max(out5, axis=1)  # [B,2048]
        gf = jnp.concatenate([gf, cls_label_onehot.astype(gf.dtype)], -1)
        tiled = jnp.broadcast_to(gf[:, None, :], (B, N, gf.shape[-1]))
        # canonical skip set: the conv1/conv2/conv3 intermediates, out3
        # PRE-transform (net_transformed is consumed by conv4 only)
        h = jnp.concatenate([tiled, out1, out2, out3, out4, out5], -1)
        for i, f in enumerate((256, 256, 128)):
            h = nn.Dense(f, name=f"convs{i + 1}", dtype=self.dtype)(h)
            h = BatchNorm(name=f"bns{i + 1}", dtype=self.dtype)(
                h, use_running_average=not train, momentum=bn_momentum)
            h = nn.relu(h)
        h = nn.Dense(self.num_part, name="convs4", dtype=self.dtype)(h)
        return log_softmax_head(h.astype(jnp.float32)), \
            {"trans_feat": trans_feat}


class PointNetSemSeg(nn.Module):
    """PointNet semantic segmentation over 9-dim block features."""

    num_class: int = 13
    channel: int = 9
    dtype: Optional[object] = None  # bf16 serving/mixed-precision mode

    @nn.compact
    def __call__(self, points, train: bool = True, bn_momentum: float = 0.1):
        feat, trans, trans_feat = PointNetEncoder(
            global_feat=False, feature_transform=True, channel=self.channel,
            name="feat", f32_train_guard=True,  # raw 9-dim block feats
            dtype=self.dtype)(points, train, bn_momentum)
        h = SharedMLP([512, 256, 128], name="head_mlp", dtype=self.dtype)(
            feat, train, bn_momentum)
        h = nn.Dense(self.num_class, name="head_out", dtype=self.dtype)(h)
        return log_softmax_head(h.astype(jnp.float32)), \
            {"trans_feat": trans_feat}


def feature_transform_regularizer(trans: jax.Array,
                                  row_mask: Optional[jax.Array] = None
                                  ) -> jax.Array:
    """mean ||I - A Aᵀ||_F over the batch (orthogonality penalty).

    `row_mask` [B] drops rows (eval-time wrap-pad duplicates) from the
    mean without changing the unmasked value.
    """
    k = trans.shape[-1]
    trans = trans.astype(jnp.float32)
    eye = jnp.eye(k, dtype=trans.dtype)
    diff = eye - jnp.einsum("bij,bkj->bik", trans, trans)
    # eps inside the sqrt: the STN starts at exactly identity (zero-init
    # head), where ||0||'s gradient is NaN without it.
    sq = jnp.sum(jnp.square(diff.reshape(diff.shape[0], -1)), axis=1)
    val = jnp.sqrt(sq + 1e-12)
    if row_mask is not None:
        rm = row_mask.astype(val.dtype)
        return jnp.sum(val * rm) / jnp.maximum(jnp.sum(rm), 1.0)
    return jnp.mean(val)


def nll_loss(log_probs: jax.Array, target: jax.Array,
             weight: Optional[jax.Array] = None,
             row_mask: Optional[jax.Array] = None) -> jax.Array:
    """NLL on log-probabilities; log_probs [..., K], target [...] int.

    `row_mask` [B] (target's leading axis) excludes padded rows from the
    mean; class `weight` and the mask compose (both weight the sum).
    """
    picked = jnp.take_along_axis(log_probs, target[..., None], axis=-1)[..., 0]
    w = weight[target] if weight is not None else None
    if row_mask is not None:
        rm = row_mask.reshape(
            row_mask.shape + (1,) * (picked.ndim - 1)).astype(picked.dtype)
        rm = jnp.broadcast_to(rm, picked.shape)
        w = rm if w is None else w * rm
    if w is not None:
        return -jnp.sum(picked * w) / jnp.maximum(jnp.sum(w), 1e-9)
    return -jnp.mean(picked)


def pointnet_loss(log_probs, target, aux, mat_diff_loss_scale: float = 0.001,
                  weight: Optional[jax.Array] = None,
                  row_mask: Optional[jax.Array] = None) -> jax.Array:
    """NLL + orthogonality regularizer on the feature transform."""
    loss = nll_loss(log_probs, target, weight, row_mask=row_mask)
    tf = aux.get("trans_feat") if aux else None
    if tf is not None:
        loss = loss + mat_diff_loss_scale * feature_transform_regularizer(
            tf, row_mask=row_mask)
    return loss

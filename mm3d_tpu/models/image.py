"""2D image branch: a compact ResNet (Flax, channels-last NHWC).

The lineage wraps a torchvision ResNet-18/VGG-style CNN (SURVEY.md §2.3
"Image branch"); torchvision doesn't exist here and the rebuild is
self-contained, so this is a from-scratch residual CNN sized for the
64-128 px synthetic views: stem + 3 stages of BasicBlocks, returning both
a stride-4 feature map (for per-point sampling) and a pooled global
vector (for late fusion).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mm3d_tpu.models.layers import BatchNorm


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool = True, bn_momentum: float = 0.1):
        residual = x
        y = nn.Conv(self.features, (3, 3), strides=(self.stride,) * 2,
                    padding="SAME", use_bias=False, name="conv1",
                    dtype=self.dtype)(x)
        y = BatchNorm(name="bn1", dtype=self.dtype)(y, use_running_average=not train,
                                  momentum=bn_momentum)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False,
                    name="conv2", dtype=self.dtype)(y)
        y = BatchNorm(name="bn2", dtype=self.dtype)(y, use_running_average=not train,
                                  momentum=bn_momentum)
        if residual.shape[-1] != self.features or self.stride != 1:
            residual = nn.Conv(self.features, (1, 1),
                               strides=(self.stride,) * 2, use_bias=False,
                               name="proj", dtype=self.dtype)(residual)
            residual = BatchNorm(name="bn_proj", dtype=self.dtype)(
                residual, use_running_average=not train, momentum=bn_momentum)
        return nn.relu(y + residual)


class ImageEncoder(nn.Module):
    """Residual CNN -> (feature map [B,H/4,W/4,C_map], global [B,C_glob])."""

    stage_features: Sequence[int] = (32, 64, 128)
    blocks_per_stage: int = 2
    global_features: int = 512
    # the per-point fusion models consume only the feature map; skip
    # the global head there so its 128x512 Dense isn't trained,
    # checkpointed and weight-transferred dead
    include_global: bool = True
    dtype: object = None

    @nn.compact
    def __call__(self, img, train: bool = True, bn_momentum: float = 0.1):
        x = nn.Conv(self.stage_features[0], (3, 3), padding="SAME",
                    use_bias=False, name="stem", dtype=self.dtype)(img)
        x = BatchNorm(name="stem_bn", dtype=self.dtype)(x, use_running_average=not train,
                                      momentum=bn_momentum)
        x = nn.relu(x)
        for s, feats in enumerate(self.stage_features):
            stride = 1 if s == 0 else 2
            x = BasicBlock(feats, stride, name=f"s{s}b0",
                           dtype=self.dtype)(x, train, bn_momentum)
            for b in range(1, self.blocks_per_stage):
                x = BasicBlock(feats, 1, name=f"s{s}b{b}",
                               dtype=self.dtype)(x, train, bn_momentum)
        fmap = x  # stride 4 wrt input (two stride-2 stages)
        if not self.include_global:
            return fmap, None
        gap = jnp.mean(fmap, axis=(1, 2))
        glob = nn.Dense(self.global_features, name="fc_glob",
                        dtype=self.dtype)(gap)
        glob = nn.relu(glob)
        return fmap, glob

"""On-device metric computation (jit-friendly reductions).

The lineage computes accuracy/mIoU in per-batch numpy on the host
(SURVEY.md §2.4, §5); here every metric is a pure jnp reduction so eval
runs fully on device and only scalars (or a confusion matrix) cross back
per epoch.

Part-seg mIoU follows the ShapeNetPart protocol: predictions are argmaxed
*within the shape's category part range*; per-shape IoU averages over the
category's parts with empty-union parts counting as IoU 1.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def accuracy(log_probs: jax.Array, target: jax.Array) -> jax.Array:
    """Mean top-1 accuracy. log_probs [..., K], target [...]."""
    pred = jnp.argmax(log_probs, axis=-1)
    return jnp.mean((pred == target).astype(jnp.float32))


def confusion_matrix(pred: jax.Array, target: jax.Array,
                     num_classes: int, weights=None) -> jax.Array:
    """[C, C] counts, rows = true class, cols = predicted.

    `weights` (same shape as pred, int) masks/weights each element —
    used to exclude padded rows from full-test-set eval batches.
    """
    idx = target.reshape(-1) * num_classes + pred.reshape(-1)
    w = (jnp.ones_like(idx, jnp.int32) if weights is None
         else jnp.broadcast_to(weights, pred.shape).reshape(-1)
         .astype(jnp.int32))
    cm = jnp.zeros((num_classes * num_classes,), jnp.int32)
    cm = cm.at[idx].add(w)
    return cm.reshape(num_classes, num_classes)


def per_class_accuracy(cm: jax.Array) -> jax.Array:
    """Mean recall over classes present in `cm` (the lineage's 'class acc')."""
    support = cm.sum(axis=1)
    correct = jnp.diagonal(cm)
    acc = jnp.where(support > 0, correct / jnp.maximum(support, 1), 0.0)
    present = (support > 0).astype(jnp.float32)
    return jnp.sum(acc * present) / jnp.maximum(jnp.sum(present), 1.0)


def iou_from_confusion(cm: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-class IoU and mean IoU over classes with nonzero union."""
    tp = jnp.diagonal(cm).astype(jnp.float32)
    fp = cm.sum(axis=0).astype(jnp.float32) - tp
    fn = cm.sum(axis=1).astype(jnp.float32) - tp
    union = tp + fp + fn
    iou = jnp.where(union > 0, tp / jnp.maximum(union, 1.0), 0.0)
    present = (union > 0).astype(jnp.float32)
    miou = jnp.sum(iou * present) / jnp.maximum(jnp.sum(present), 1.0)
    return iou, miou


def masked_part_argmax(log_probs: jax.Array, part_start: jax.Array,
                       part_count: jax.Array) -> jax.Array:
    """Argmax restricted to each shape's category part range.

    log_probs [B, N, P]; part_start/part_count [B] int32.
    """
    P = log_probs.shape[-1]
    pid = jax.lax.broadcasted_iota(jnp.int32, (1, 1, P), 2)
    valid = (pid >= part_start[:, None, None]) & (
        pid < (part_start + part_count)[:, None, None])
    masked = jnp.where(valid, log_probs, -jnp.inf)
    return jnp.argmax(masked, axis=-1).astype(jnp.int32)


def shape_ious(pred: jax.Array, seg: jax.Array, part_start: jax.Array,
               part_count: jax.Array, max_parts: int) -> jax.Array:
    """Per-shape mean IoU over its category's parts (ShapeNetPart protocol).

    pred/seg [B, N] global part labels; part_start/part_count [B].
    Returns [B] float IoUs.  Parts with empty pred∧target union count 1.
    """
    B, N = pred.shape
    j = jax.lax.broadcasted_iota(jnp.int32, (B, max_parts), 1)
    part_id = part_start[:, None] + j  # [B, max_parts]
    in_range = j < part_count[:, None]
    pred_eq = pred[:, None, :] == part_id[:, :, None]   # [B, max_parts, N]
    seg_eq = seg[:, None, :] == part_id[:, :, None]
    inter = jnp.sum(pred_eq & seg_eq, axis=-1).astype(jnp.float32)
    union = jnp.sum(pred_eq | seg_eq, axis=-1).astype(jnp.float32)
    iou = jnp.where(union > 0, inter / jnp.maximum(union, 1.0), 1.0)
    iou = jnp.where(in_range, iou, 0.0)
    return jnp.sum(iou, axis=1) / jnp.maximum(part_count.astype(jnp.float32), 1.0)


def partseg_metrics_host(all_ious: np.ndarray, all_cats: np.ndarray,
                         num_categories: int) -> Dict[str, float]:
    """Aggregate per-shape IoUs: instance mIoU + class-average mIoU."""
    inst = float(all_ious.mean()) if len(all_ious) else 0.0
    per_cat = []
    for c in range(num_categories):
        m = all_cats == c
        if m.any():
            per_cat.append(float(all_ious[m].mean()))
    return {"instance_miou": inst,
            "class_miou": float(np.mean(per_cat)) if per_cat else 0.0}

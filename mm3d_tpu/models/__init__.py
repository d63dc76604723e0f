"""L2 model layer: PointNet / PointNet++ / image branch / multimodal fusion."""

from mm3d_tpu.models import fusion, image, layers, pointnet, pointnet2, registry
from mm3d_tpu.models.registry import get_model, available

__all__ = ["fusion", "image", "layers", "pointnet", "pointnet2", "registry",
           "get_model", "available"]

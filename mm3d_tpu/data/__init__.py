"""L1 data layer: augmentations, synthetic datasets, loaders, pipeline."""

from mm3d_tpu.data import augment
from mm3d_tpu.data.pipeline import DataPipeline

__all__ = ["augment", "DataPipeline"]

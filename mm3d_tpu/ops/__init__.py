"""L0 geometry ops.

`geometry` holds the pure-JAX reference implementations (always correct,
run anywhere).  `pallas_kernels` holds the TPU Mosaic kernels for the hot
ops.  `dispatch` picks the implementation: Pallas on TPU, pure-JAX (or
interpret-mode Pallas) elsewhere, overridable via `set_impl`.
"""

from mm3d_tpu.ops.geometry import (
    square_distance,
    index_points,
    farthest_point_sample,
    query_ball_point,
    knn_point,
    three_nn,
    three_interpolate,
    sample_and_group,
    sample_and_group_all,
)
from mm3d_tpu.ops.dispatch import set_impl, get_impl, use_impl
from mm3d_tpu.ops import projection
# importing registers the Pallas TPU kernels behind the same API
from mm3d_tpu.ops import pallas_kernels as _pallas_kernels  # noqa: F401

__all__ = [
    "square_distance",
    "index_points",
    "farthest_point_sample",
    "query_ball_point",
    "knn_point",
    "three_nn",
    "three_interpolate",
    "sample_and_group",
    "sample_and_group_all",
    "set_impl",
    "get_impl",
    "use_impl",
]

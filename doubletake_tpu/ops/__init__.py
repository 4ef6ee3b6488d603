from doubletake_tpu.ops.grid_sample import grid_sample_2d, grid_sample_3d
from doubletake_tpu.ops.resize import (
    blur_pool_2x,
    interpolate_bilinear,
    interpolate_nearest,
    pyrdown,
    upsample2x_bilinear,
)

__all__ = [
    "grid_sample_2d",
    "grid_sample_3d",
    "interpolate_bilinear",
    "interpolate_nearest",
    "upsample2x_bilinear",
    "blur_pool_2x",
    "pyrdown",
]

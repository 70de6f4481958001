from .attention import spatial_attention
from .resample import avg_pool_2x, depth_to_space, space_to_depth, upsample_nearest_2x

__all__ = [
    "spatial_attention",
    "upsample_nearest_2x",
    "avg_pool_2x",
    "space_to_depth",
    "depth_to_space",
]

from .modules import (
    DEFAULT_INIT,
    GroupNorm32,
    get_timestep_embedding,
    leaky_relu02,
    silu,
    variance_scaling_init,
)

__all__ = [
    "DEFAULT_INIT",
    "GroupNorm32",
    "get_timestep_embedding",
    "variance_scaling_init",
    "silu",
    "leaky_relu02",
]

"""NN building blocks shared by the models (flax.linen, NHWC layout).

Initialization parity: the reference re-implements Linear/Conv2d to carry a
TF variance-scaling(fan_avg, uniform) initializer with an ``init_scale``
knob, where scale 0 is approximated by 1e-10 (ddpm_torch/modules.py:11-18).
``variance_scaling_init`` reproduces that exactly; bias init is zeros.

Padding parity: the reference's SamePad2d computes TF-style asymmetric
padding (floor on top/left, ceil on bottom/right, ddpm_torch/modules.py:
126-160). In NHWC flax that is simply ``padding="SAME"`` on the conv — XLA
implements the identical rule, so no separate pad module is required.
"""

from __future__ import annotations

import math
from typing import Callable

import flax.linen as nn
import jax.numpy as jnp

__all__ = [
    "variance_scaling_init",
    "DEFAULT_INIT",
    "ZERO_INIT_SCALE",
    "get_timestep_embedding",
    "GroupNorm32",
    "silu",
    "leaky_relu02",
]

ZERO_INIT_SCALE = 1e-10


def variance_scaling_init(scale: float = 1.0) -> Callable:
    """TF variance-scaling(fan_avg, uniform); scale<=0 means (near-)zero init."""
    return nn.initializers.variance_scaling(
        scale or ZERO_INIT_SCALE, mode="fan_avg", distribution="uniform"
    )


DEFAULT_INIT = variance_scaling_init(1.0)


def get_timestep_embedding(timesteps: jnp.ndarray, embed_dim: int, dtype=jnp.float32):
    """fairseq-style sinusoidal timestep embedding.

    freq_i = exp(-i * ln(10000) / (half - 1)); output = [sin(t*f), cos(t*f)],
    zero-padded if ``embed_dim`` is odd (reference: ddpm_torch/functions.py:10-26).
    """
    half_dim = embed_dim // 2
    log_scale = math.log(10000.0) / (half_dim - 1)
    freqs = jnp.exp(-log_scale * jnp.arange(half_dim, dtype=dtype))
    args = timesteps.reshape(-1).astype(dtype)[:, None] * freqs[None, :]
    embed = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=1)
    if embed_dim % 2 == 1:
        embed = jnp.pad(embed, ((0, 0), (0, 1)))
    return embed


class GroupNorm32(nn.Module):
    """GroupNorm(32 groups, eps 1e-6) computed in f32 regardless of the
    compute dtype (reference default normalizer: unet.py:18-20)."""

    num_groups: int = 32
    epsilon: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.GroupNorm(
            num_groups=self.num_groups,
            epsilon=self.epsilon,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
        )(x.astype(jnp.float32))
        return y.astype(self.dtype)


def silu(x):
    return nn.silu(x)


def leaky_relu02(x):
    """LeakyReLU with the reference toy model's 0.02 slope (toy_model.py:14)."""
    return nn.leaky_relu(x, negative_slope=0.02)

"""Spatial resampling primitives (NHWC): nearest upsample, average pool,
space-to-depth / depth-to-space (the reference's PixelUnshuffle/PixelShuffle
block trick, ddpm_torch/utils/train.py:349-367)."""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

__all__ = ["upsample_nearest_2x", "avg_pool_2x", "space_to_depth", "depth_to_space"]


def upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor x2 upsample of (B, H, W, C).

    Matches torch.nn.Upsample(scale_factor=2, mode="nearest") (each source
    pixel becomes a 2x2 block), which is what the reference uses on the up
    path (unet.py:199).
    """
    B, H, W, C = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (B, H, 2, W, 2, C))
    return x.reshape(B, 2 * H, 2 * W, C)


def avg_pool_2x(x: jnp.ndarray) -> jnp.ndarray:
    """2x2/stride-2 average pool of (B, H, W, C) (reference unet.py:169)."""
    summed = lax.reduce_window(
        x, 0.0, lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )
    return summed * 0.25


def space_to_depth(x: jnp.ndarray, block_size: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/b, W/b, C*b*b), channel-major within each block
    to match torch.PixelUnshuffle's output channel order [C, bh, bw]."""
    b = block_size
    B, H, W, C = x.shape
    x = x.reshape(B, H // b, b, W // b, b, C)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # B, H/b, W/b, C, bh, bw
    return x.reshape(B, H // b, W // b, C * b * b)


def depth_to_space(x: jnp.ndarray, block_size: int) -> jnp.ndarray:
    """Inverse of :func:`space_to_depth` (torch.PixelShuffle ordering)."""
    b = block_size
    B, H, W, Cb = x.shape
    C = Cb // (b * b)
    x = x.reshape(B, H, W, C, b, b)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # B, H, bh, W, bw, C
    return x.reshape(B, H * b, W * b, C)

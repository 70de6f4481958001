"""Host-side image transforms (numpy/PIL), matching the reference pipelines.

The reference uses torchvision transform stacks (ddpm_torch/datasets.py:
28-198). Here the *random* part (horizontal flip) and the normalization to
[-1, 1] run vectorized on whole uint8 batches in numpy — the TPU feed wants
batched NHWC float32, not per-sample tensors — while the *static* geometry
(resize, crop) is applied once at dataset-load/decode time.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "normalize_to_unit",
    "random_hflip",
    "crop_celeba",
    "resize_batch",
    "to_uint8",
]


def normalize_to_unit(batch_u8: np.ndarray) -> np.ndarray:
    """uint8 [0,255] NHWC -> float32 [-1, 1] (Normalize(0.5, 0.5))."""
    return batch_u8.astype(np.float32) / 127.5 - 1.0


def to_uint8(x: np.ndarray) -> np.ndarray:
    """float [-1,1] -> uint8, matching generate.py:129's round/clamp."""
    return np.clip(np.rint(x * 127.5 + 127.5), 0, 255).astype(np.uint8)


def random_hflip(batch: np.ndarray, rng: np.random.Generator, p: float = 0.5) -> np.ndarray:
    """Per-example random horizontal flip of an NHWC batch."""
    flip = rng.random(batch.shape[0]) < p
    if not flip.any():
        return batch
    out = batch.copy()
    out[flip] = out[flip, :, ::-1]
    return out


def crop_celeba(img_hwc: np.ndarray) -> np.ndarray:
    """The reference's fixed CelebA face crop: top=40, left=15, 148x148
    (ddpm_torch/datasets.py:68-69)."""
    return img_hwc[40 : 40 + 148, 15 : 15 + 148]


def resize_batch(batch_u8: np.ndarray, size: int) -> np.ndarray:
    """Bilinear-resize an NHWC uint8 batch to (size, size) via PIL (matches
    torchvision Resize's default bilinear+antialias behavior closely enough
    for training; exact resampling parity only matters for FID inputs, which
    use their own resize inside the metric)."""
    from PIL import Image

    if batch_u8.shape[1] == size and batch_u8.shape[2] == size:
        return batch_u8
    out = np.empty((batch_u8.shape[0], size, size, batch_u8.shape[3]), np.uint8)
    for i, im in enumerate(batch_u8):
        pil = Image.fromarray(im.squeeze(-1) if im.shape[-1] == 1 else im)
        resized = np.asarray(pil.resize((size, size), Image.BILINEAR))
        out[i] = resized[..., None] if resized.ndim == 2 else resized
    return out

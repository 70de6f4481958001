"""Image grid / scatterplot saving (PIL + matplotlib, host-side).

Replaces torchvision.utils.save_image (used at ddpm_torch/utils/train.py:61,
217-221) and the toy scatterplot helpers (ddpm_torch/utils/__init__.py:62-93).
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np

__all__ = ["save_image_grid", "save_scatterplot", "infer_range", "split_squeeze"]


def split_squeeze(data: np.ndarray) -> tuple:
    """Split an (N, 2) point set into x/y 1-D arrays for plotting
    (reference: ddpm_torch/utils/__init__.py:88-93)."""
    x, y = np.split(np.asarray(data), 2, axis=1)
    return x.squeeze(1), y.squeeze(1)


def save_image_grid(path: str, images: np.ndarray, nrow: Optional[int] = None, padding: int = 2):
    """Save an NHWC float[-1,1] (or uint8) batch as a tiled PNG grid."""
    from PIL import Image

    x = np.asarray(images)
    if x.dtype != np.uint8:
        x = np.clip(np.rint((x + 1.0) * 127.5), 0, 255).astype(np.uint8)
    n, h, w, c = x.shape
    nrow = nrow or int(math.ceil(math.sqrt(n)))
    ncol = int(math.ceil(n / nrow))
    grid = np.zeros((ncol * (h + padding) + padding, nrow * (w + padding) + padding, c), np.uint8)
    for i, im in enumerate(x):
        r, col = divmod(i, nrow)
        y0 = r * (h + padding) + padding
        x0 = col * (w + padding) + padding
        grid[y0 : y0 + h, x0 : x0 + w] = im
    Image.fromarray(grid.squeeze(-1) if c == 1 else grid).save(path)
    return path


def infer_range(data: np.ndarray, precision: int = 0) -> tuple:
    """Symmetric plot range covering the data, rounded up
    (reference: ddpm_torch/utils/__init__.py:62-67)."""
    lim = np.rint(np.abs(data).max() + 0.5 * 10.0**-precision)
    return (-lim, lim)


def save_scatterplot(path: str, data: np.ndarray, xlim=None, ylim=None, s: float = 0.5):
    """2-D scatter of an (N, 2) point set (toy training visualization)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(4, 4), dpi=150)
    ax.scatter(data[:, 0], data[:, 1], s=s)
    lim = infer_range(data)
    ax.set_xlim(xlim or lim)
    ax.set_ylim(ylim or lim)
    ax.set_aspect("equal")
    fig.tight_layout()
    fig.savefig(path)
    plt.close(fig)
    return path

"""FID: streaming activation statistics + Frechet distance.

Semantics match ddpm_torch/metrics/fid_score.py:
  * ``StreamingStats`` uses the same Chan-style incremental mean/covariance
    update in float64 (fid_score.py:116-135) with Bessel correction applied
    on extract (137-142);
  * ``calc_fd`` is the Dougal-Sutherland stable Frechet distance: scipy
    ``sqrtm`` with eps-diagonal retry and imaginary-component check
    (fid_score.py:269-323);
  * ``get_precomputed`` loads reference mu/sigma npz files from a local
    ``precomputed/`` directory (the reference downloads the TTUR files,
    fid_score.py:150-183; this environment has no egress, so the files must
    be provided locally — ``compute_dataset_stats`` produces them from raw
    data as the reference's eval.py fallback does, eval.py:87-94).
"""

from __future__ import annotations

import os
from typing import Callable, Optional, Tuple

import numpy as np

__all__ = ["StreamingStats", "calc_fd", "get_precomputed", "compute_dataset_stats"]


class StreamingStats:
    """Streaming mean + covariance over feature batches (float64, host)."""

    def __init__(self, dim: Optional[int] = 2048):
        # dim=None: infer the feature width from the first update() batch
        self.dim = dim
        self.reset()

    def reset(self) -> None:
        if self.dim is None:
            self.running_mean = None
            self.running_var = None
        else:
            self.running_mean = np.zeros((self.dim,), np.float64)
            self.running_var = np.zeros((self.dim, self.dim), np.float64)
        self.count = 0

    def update(self, acts: np.ndarray) -> None:
        acts = np.asarray(acts, np.float64)
        if self.running_mean is None:
            self.dim = acts.shape[1]
            self.running_mean = np.zeros((self.dim,), np.float64)
            self.running_var = np.zeros((self.dim, self.dim), np.float64)
        mean = acts.mean(axis=0)
        var = np.cov(acts, rowvar=False, ddof=0)
        count = acts.shape[0]
        alpha = count / (self.count + count)
        if self.count == 0:
            self.running_mean += mean
            self.running_var += var
        else:
            mean_diff = mean - self.running_mean
            self.running_mean += alpha * mean_diff
            self.running_var += alpha * (var - self.running_var)
            self.running_var += alpha * (1 - alpha) * np.outer(mean_diff, mean_diff)
        self.count += count

    def get_statistics(self) -> Tuple[np.ndarray, np.ndarray]:
        assert self.count > 1, "count must be greater than 1"
        return (
            self.running_mean.copy(),
            self.running_var * self.count / (self.count - 1),
        )


def calc_fd(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """Frechet distance between N(mu1, sigma1) and N(mu2, sigma2)."""
    from scipy import linalg

    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    assert mu1.shape == mu2.shape and sigma1.shape == sigma2.shape

    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(sigma1.dot(sigma2), disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            raise ValueError(f"imaginary component {np.max(np.abs(covmean.imag))}")
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2) - 2 * np.trace(covmean))


def get_precomputed(dataset: str, download_dir: str = "precomputed"):
    """Load locally cached reference statistics ``fid_stats_{dataset}.npz``."""
    candidates = [
        os.path.join(download_dir, f"fid_stats_{dataset}.npz"),
        os.path.join(download_dir, f"fid_stats_{dataset}_train.npz"),
        os.path.join(download_dir, "fid_stats_celeba_148x148.npz")
        if dataset == "celeba"
        else None,
    ]
    for path in filter(None, candidates):
        if os.path.exists(path):
            data = np.load(path)
            return data["mu"], data["sigma"]
    raise FileNotFoundError(
        f"no precomputed FID stats for {dataset!r} under {download_dir}/ "
        "(no-egress environment: provide the npz locally or run "
        "compute_dataset_stats on the raw data)"
    )


def compute_dataset_stats(
    batches,
    extract_features: Callable[[np.ndarray], np.ndarray],
    save_path: Optional[str] = None,
    dim: Optional[int] = None,
):
    """Stream raw-data batches (uint8 NHWC or float [0,1]) through the
    feature extractor and return/save (mu, sigma) — the reference eval.py
    fallback (eval.py:87-94)."""
    stats = StreamingStats(dim)
    for batch in batches:
        batch = np.asarray(batch)
        if batch.dtype == np.uint8:
            batch = batch.astype(np.float32) / 255.0
        stats.update(np.asarray(extract_features(batch)))
    mu, sigma = stats.get_statistics()
    if save_path:
        os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
        np.savez(save_path, mu=mu, sigma=sigma)
    return mu, sigma

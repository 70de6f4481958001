"""Toy 2-D evaluator: histogram KL divergence between generated and true
samples (reference: ddpm_torch/toy/toy_utils.py:127-163).

``eval`` generates ``total_size`` points via the given sampler and compares a
(bins x bins) 2-D histogram against the true data histogram with the
empirical KL of math/likelihood.py, returning {"kld": ...} plus the samples
for scatterplotting.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np

from ..math.likelihood import discrete_klv2d, hist2d

__all__ = ["ToyEvaluator"]


class ToyEvaluator:
    def __init__(
        self,
        true_data: np.ndarray,
        total_size: int = 30000,
        batch_size: int = 10000,
        value_range: float = 3.0,
        bins: int = 60,
    ):
        self.total_size = total_size
        self.batch_size = batch_size
        self.value_range = value_range
        self.bins = bins
        self.true_hist = self._normalized_hist(np.asarray(true_data)[:total_size])

    def _normalized_hist(self, data: np.ndarray) -> np.ndarray:
        h = hist2d(data, bins=self.bins, value_range=self.value_range)
        return h / max(h.sum(), 1)

    def eval(self, sample_fn: Callable[[int, Optional[int]], np.ndarray]):
        """``sample_fn(n, batch_index)`` -> (n, 2) array of generated points."""
        chunks = []
        remaining = self.total_size
        i = 0
        while remaining > 0:
            n = min(self.batch_size, remaining)
            chunks.append(np.asarray(sample_fn(n, i)))
            remaining -= n
            i += 1
        samples = np.concatenate(chunks)[: self.total_size]
        gen_hist = self._normalized_hist(samples)
        kld = discrete_klv2d(gen_hist, self.true_hist)
        return {"kld": kld, "samples": samples}

"""Improved Precision & Recall (Kynkäänniemi et al. 2019).

Reference: ddpm_torch/metrics/precision_recall.py. The manifold math —
fp16 feature store, batched pairwise distances, k-th neighbor radii
(``nhood_size + 1``-th smallest to exclude self), membership tests in both
directions — is reproduced with a **jitted distance kernel**: each
(row_batch x col_batch) Euclidean distance tile is one MXU matmul via the
||a-b||^2 = ||a||^2 + ||b||^2 - 2 a.b expansion, streamed over the feature
set with static tile shapes (pad + mask on the ragged tails).

The feature extractor is pluggable: the reference hard-wires NVIDIA's
TorchScript VGG16 (precision_recall.py:22-40); here any ``f(batch) -> (B, D)``
callable works (metrics/vgg.py provides the VGG16 port, and the FID
Inception features are a supported drop-in when VGG weights are absent).
"""

from __future__ import annotations

import math
from collections import namedtuple
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["Manifold", "ManifoldBuilder", "calc_pr", "compute_distance"]

Manifold = namedtuple("Manifold", ["features", "kth"])


@jax.jit
def _dist_tile(rows: jnp.ndarray, cols: jnp.ndarray) -> jnp.ndarray:
    """Pairwise Euclidean distances of one (R, D) x (C, D) tile in f32."""
    rows = rows.astype(jnp.float32)
    cols = cols.astype(jnp.float32)
    rr = jnp.sum(rows * rows, axis=1, keepdims=True)
    cc = jnp.sum(cols * cols, axis=1, keepdims=True)
    sq = rr + cc.T - 2.0 * (rows @ cols.T)
    return jnp.sqrt(jnp.maximum(sq, 0.0))


def _pad_to(x: np.ndarray, n: int) -> np.ndarray:
    if len(x) == n:
        return x
    return np.concatenate([x, np.zeros((n - len(x),) + x.shape[1:], x.dtype)])


def compute_distance(
    row_features: np.ndarray,
    col_features: np.ndarray,
    row_batch_size: int = 10000,
    col_batch_size: int = 10000,
) -> np.ndarray:
    """Full (R, C) distance matrix, computed in static-shape device tiles."""
    R, C = len(row_features), len(col_features)
    # static tile shapes => a single jit compilation for the whole sweep
    rtile = min(row_batch_size, R)
    ctile = min(col_batch_size, C)
    out = np.empty((R, C), np.float16)
    for i in range(0, R, rtile):
        rb = row_features[i : i + rtile]
        rpad = _pad_to(rb, rtile)
        for j in range(0, C, ctile):
            cb = col_features[j : j + ctile]
            cpad = _pad_to(cb, ctile)
            tile = np.asarray(_dist_tile(jnp.asarray(rpad), jnp.asarray(cpad)))
            out[i : i + len(rb), j : j + len(cb)] = tile[: len(rb), : len(cb)].astype(
                np.float16
            )
    return out


class ManifoldBuilder:
    """Extract (<=max_size) features and k-th neighbor radii.

    ``data`` may be (a) an iterable of image batches (uint8 NHWC or float
    [0,1]) fed through ``extractor``, or (b) a precomputed (N, D) feature
    array. Features are stored fp16 (precision_recall.py:141).
    """

    def __init__(
        self,
        data=None,
        extractor: Optional[Callable] = None,
        features: Optional[np.ndarray] = None,
        max_size: int = 50000,
        nhood_size: int = 3,
        row_batch_size: int = 10000,
        col_batch_size: int = 10000,
    ):
        self.nhood_size = nhood_size
        self.row_batch_size = row_batch_size
        self.col_batch_size = col_batch_size

        if features is None:
            assert data is not None and extractor is not None
            chunks = []
            total = 0
            for batch in data:
                batch = np.asarray(batch)
                if batch.dtype == np.uint8:
                    batch = batch.astype(np.float32) / 255.0
                chunks.append(np.asarray(extractor(batch)))
                total += len(batch)
                if total >= max_size:
                    break
            features = np.concatenate(chunks)[:max_size]
        self.features = np.asarray(features, np.float16)
        self.kth = self.compute_kth(self.features)

    def compute_kth(self, row_features: np.ndarray, col_features=None) -> np.ndarray:
        if col_features is None:
            col_features = row_features
        kth = []
        for i in range(0, len(row_features), self.row_batch_size):
            rb = row_features[i : i + self.row_batch_size]
            dist = compute_distance(
                rb, col_features, self.row_batch_size, self.col_batch_size
            ).astype(np.float32)
            # (nhood_size + 1)-th smallest excludes the self-distance
            kth.append(
                np.partition(dist, self.nhood_size, axis=1)[:, self.nhood_size].astype(
                    np.float16
                )
            )
        return np.concatenate(kth)

    @property
    def manifold(self) -> Manifold:
        return Manifold(features=self.features, kth=self.kth)

    def save(self, fpath: str) -> None:
        import os

        d = os.path.dirname(fpath)
        if d and not os.path.exists(d):
            os.makedirs(d)
        np.savez(fpath, features=self.features, kth=self.kth)

    @staticmethod
    def load(fpath: str) -> Manifold:
        data = np.load(fpath)
        return Manifold(features=data["features"], kth=data["kth"])


def calc_pr(
    manifold_1: Manifold,
    manifold_2: Manifold,
    row_batch_size: int = 10000,
    col_batch_size: int = 10000,
):
    """(precision, recall): precision = fraction of generated (manifold_1)
    features inside ANY true k-NN ball (manifold_2); recall symmetric
    (precision_recall.py:177-206)."""

    def membership(probe: Manifold, target: Manifold) -> float:
        hits = []
        for i in range(0, len(probe.features), row_batch_size):
            pb = probe.features[i : i + row_batch_size]
            dist = compute_distance(pb, target.features, row_batch_size, col_batch_size)
            hits.append((dist <= target.kth[None, :]).any(axis=1))
        return float(np.concatenate(hits).mean())

    precision = membership(manifold_1, manifold_2)
    recall = membership(manifold_2, manifold_1)
    return precision, recall

"""Likelihood / KL math used by the VLB loss and bits-per-dim evaluation.

Pure jnp functions — everything here is traced into the jitted train/eval
steps and fuses into surrounding elementwise work on the VPU.

Reference semantics: ddpm_torch/functions.py:29-106.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

__all__ = [
    "normal_kl",
    "approx_std_normal_cdf",
    "discretized_gaussian_loglik",
    "continuous_gaussian_loglik",
    "flat_mean",
    "flat_sum",
    "discrete_klv2d",
    "hist2d",
]


def normal_kl(mean1, logvar1, mean2, logvar2):
    """KL( N(mean1, exp(logvar1)) || N(mean2, exp(logvar2)) ), elementwise."""
    diff_logvar = logvar1 - logvar2
    return 0.5 * (
        -1.0
        - diff_logvar
        + jnp.square(mean1 - mean2) * jnp.exp(-logvar2)
        + jnp.exp(diff_logvar)
    )


def approx_std_normal_cdf(x):
    """Page (1977) tanh approximation to the standard normal CDF."""
    return 0.5 * (1.0 + jnp.tanh(math.sqrt(2.0 / math.pi) * (x + 0.044715 * jnp.power(x, 3))))


def discretized_gaussian_loglik(
    x,
    means,
    log_scale,
    precision: float = 1.0 / 255,
    cutoff=(-0.999, 0.999),
    tol: float = 1e-12,
):
    """Log-likelihood of 8-bit pixels under a discretized Gaussian decoder.

    Assumes integer data in [0, 255] rescaled to [-1, 1]; each pixel's
    probability mass is the CDF difference across its +-1/255 bin, with the
    extreme bins saturating to the distribution tails.
    """
    if isinstance(cutoff, float):
        cutoff = (-cutoff, cutoff)
    x_centered = x - means
    inv_stdv = jnp.exp(-log_scale)
    upper = inv_stdv * (x_centered + precision)
    cdf_upper = jnp.where(x > cutoff[1], 1.0, approx_std_normal_cdf(upper))
    lower = inv_stdv * (x_centered - precision)
    cdf_lower = jnp.where(x < cutoff[0], 0.0, approx_std_normal_cdf(lower))
    return jnp.log(jnp.clip(cdf_upper - cdf_lower - tol, 0.0, None) + tol)


def continuous_gaussian_loglik(x, mean, logvar):
    """Continuous Gaussian log-likelihood (used by the toy 2-D decoder)."""
    x_centered = x - mean
    inv_var = jnp.exp(-logvar)
    log_probs = jnp.square(x_centered) * inv_var + math.log(2 * math.pi) + logvar
    return -0.5 * log_probs


def flat_mean(x, start_dim: int = 1):
    """Mean over all dims except the leading ``start_dim`` ones."""
    return jnp.mean(x, axis=tuple(range(start_dim, x.ndim)))


def flat_sum(x, start_dim: int = 1):
    return jnp.sum(x, axis=tuple(range(start_dim, x.ndim)))


def discrete_klv2d(hist1, hist2, eps: float = 1e-9) -> float:
    """Empirical KL between two (normalized) 2-D histograms (host numpy)."""
    return float(np.sum(hist2 * (np.log(hist2 + eps) - np.log(hist1 + eps))))


def hist2d(data, bins, value_range=None):
    """2-D histogram matrix for a (N, 2) point set (host numpy)."""
    data = np.asarray(data)
    if bins == "auto":
        bins = math.floor(math.sqrt(len(data) // 10))
    if value_range is not None:
        if isinstance(value_range, (int, float)):
            value_range = ((-value_range, value_range),) * 2
        elif hasattr(value_range, "__iter__"):
            if not hasattr(next(iter(value_range)), "__iter__"):
                value_range = (value_range,) * 2
    x, y = data[:, 0], data[:, 1]
    return np.histogram2d(x, y, bins=bins, range=value_range)[0]

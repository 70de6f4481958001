from .likelihood import (
    approx_std_normal_cdf,
    continuous_gaussian_loglik,
    discrete_klv2d,
    discretized_gaussian_loglik,
    flat_mean,
    flat_sum,
    hist2d,
    normal_kl,
)
from .schedules import (
    DiffusionCoefficients,
    compute_coefficients,
    get_beta_schedule,
)

__all__ = [
    "get_beta_schedule",
    "compute_coefficients",
    "DiffusionCoefficients",
    "normal_kl",
    "approx_std_normal_cdf",
    "discretized_gaussian_loglik",
    "continuous_gaussian_loglik",
    "flat_mean",
    "flat_sum",
    "discrete_klv2d",
    "hist2d",
]

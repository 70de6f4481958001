"""Beta schedules and diffusion coefficient tables.

All schedules and coefficient tables are computed in **float64 numpy** on the
host (TPUs run f32/bf16; the f64 precompute happens once at construction and
is downcast when the tables are shipped to the device). This mirrors the
precision strategy of the reference implementation
(ddpm_torch/diffusion.py:13-73 computes everything in torch.float64 and
downcasts at `_extract` time).

Schedules supported (reference: ddpm_torch/diffusion.py:13-29):
  quad, linear, warmup10, warmup50, const, jsd
"""

from __future__ import annotations

import dataclasses

import numpy as np

__all__ = ["get_beta_schedule", "DiffusionCoefficients", "compute_coefficients"]


def _warmup_beta(beta_start: float, beta_end: float, timesteps: int, warmup_frac: float) -> np.ndarray:
    betas = np.full(timesteps, beta_end, dtype=np.float64)
    warmup_time = int(timesteps * warmup_frac)
    betas[:warmup_time] = np.linspace(beta_start, beta_end, warmup_time, dtype=np.float64)
    return betas


def get_beta_schedule(
    beta_schedule: str,
    beta_start: float,
    beta_end: float,
    timesteps: int,
) -> np.ndarray:
    """Return the (timesteps,) float64 beta schedule."""
    if beta_schedule == "quad":
        betas = np.linspace(beta_start**0.5, beta_end**0.5, timesteps, dtype=np.float64) ** 2
    elif beta_schedule == "linear":
        betas = np.linspace(beta_start, beta_end, timesteps, dtype=np.float64)
    elif beta_schedule == "warmup10":
        betas = _warmup_beta(beta_start, beta_end, timesteps, 0.1)
    elif beta_schedule == "warmup50":
        betas = _warmup_beta(beta_start, beta_end, timesteps, 0.5)
    elif beta_schedule == "const":
        betas = np.full(timesteps, beta_end, dtype=np.float64)
    elif beta_schedule == "jsd":
        # 1/T, 1/(T-1), ..., 1
        betas = 1.0 / np.linspace(timesteps, 1, timesteps, dtype=np.float64)
    else:
        raise NotImplementedError(beta_schedule)
    assert betas.shape == (timesteps,)
    if not ((betas > 0).all() and (betas <= 1).all()):
        raise ValueError("betas must lie in (0, 1]")
    return betas


@dataclasses.dataclass(frozen=True)
class DiffusionCoefficients:
    """Float64 per-timestep coefficient tables for the Gaussian diffusion.

    Shapes are all (T,). Semantics match ddpm_torch/diffusion.py:51-73 (and,
    with ``eta``/``subsequence``, the generalized DDIM tables of ddim.py:61-92).
    """

    betas: np.ndarray
    alphas_bar: np.ndarray
    alphas_bar_prev: np.ndarray
    sqrt_alphas_bar: np.ndarray
    sqrt_one_minus_alphas_bar: np.ndarray
    sqrt_recip_alphas_bar: np.ndarray
    sqrt_recip_m1_alphas_bar: np.ndarray
    posterior_var: np.ndarray
    posterior_logvar_clipped: np.ndarray
    posterior_mean_coef1: np.ndarray
    posterior_mean_coef2: np.ndarray
    fixed_model_var: np.ndarray
    fixed_model_logvar: np.ndarray

    @property
    def timesteps(self) -> int:
        return len(self.betas)


def compute_coefficients(betas: np.ndarray, model_var_type: str) -> DiffusionCoefficients:
    """DDPM posterior coefficient tables (f64).

    Mirrors the table construction of ddpm_torch/diffusion.py:51-73, including
    the index-0 patches: posterior_logvar uses posterior_var[1] at index 0,
    and fixed-large's logvar table has betas[0] replaced by posterior_var[1].
    """
    betas = np.asarray(betas, dtype=np.float64)
    alphas = 1.0 - betas
    alphas_bar = np.cumprod(alphas)
    alphas_bar_prev = np.concatenate([[1.0], alphas_bar[:-1]])

    sqrt_alphas_bar = np.sqrt(alphas_bar)
    sqrt_one_minus_alphas_bar = np.sqrt(1.0 - alphas_bar)
    sqrt_alphas_bar_prev = np.sqrt(alphas_bar_prev)
    sqrt_recip_alphas_bar = np.sqrt(1.0 / alphas_bar)
    sqrt_recip_m1_alphas_bar = np.sqrt(1.0 / alphas_bar - 1.0)

    posterior_var = betas * (1.0 - alphas_bar_prev) / (1.0 - alphas_bar)
    # index 0 of posterior_var is 0; clip the log by substituting index 1
    posterior_logvar_clipped = np.log(np.concatenate([posterior_var[1:2], posterior_var[1:]]))
    posterior_mean_coef1 = betas * sqrt_alphas_bar_prev / (1.0 - alphas_bar)
    posterior_mean_coef2 = np.sqrt(alphas) * (1.0 - alphas_bar_prev) / (1.0 - alphas_bar)

    if model_var_type == "fixed-large":
        fixed_model_var = betas
        fixed_model_logvar = np.log(np.concatenate([posterior_var[1:2], betas[1:]]))
    elif model_var_type in ("fixed-small", "learned"):
        # "learned" never reads the fixed tables; store fixed-small values so
        # the pytree structure stays uniform.
        fixed_model_var = posterior_var
        fixed_model_logvar = posterior_logvar_clipped
    else:
        raise NotImplementedError(model_var_type)

    return DiffusionCoefficients(
        betas=betas,
        alphas_bar=alphas_bar,
        alphas_bar_prev=alphas_bar_prev,
        sqrt_alphas_bar=sqrt_alphas_bar,
        sqrt_one_minus_alphas_bar=sqrt_one_minus_alphas_bar,
        sqrt_recip_alphas_bar=sqrt_recip_alphas_bar,
        sqrt_recip_m1_alphas_bar=sqrt_recip_m1_alphas_bar,
        posterior_var=posterior_var,
        posterior_logvar_clipped=posterior_logvar_clipped,
        posterior_mean_coef1=posterior_mean_coef1,
        posterior_mean_coef2=posterior_mean_coef2,
        fixed_model_var=fixed_model_var,
        fixed_model_logvar=fixed_model_logvar,
    )


def compute_ddim_coefficients(
    betas: np.ndarray, model_var_type: str, eta: float, subsequence: np.ndarray
) -> DiffusionCoefficients:
    """Generalized (eta-parameterized) coefficient tables on a subsequence.

    Mirrors ddim.py:61-92: all tables are re-derived on the restricted
    timestep subsequence; the posterior variance is scaled by eta^2 and the
    mean coefficients generalize the DDPM posterior so that eta=1 recovers
    ancestral sampling and eta=0 is the deterministic DDIM ODE step.
    """
    betas = np.asarray(betas, dtype=np.float64)
    subsequence = np.asarray(subsequence, dtype=np.int64)
    eta2 = float(eta) ** 2

    alphas_bar_full = np.cumprod(1.0 - betas)
    alphas_bar = alphas_bar_full[subsequence]
    alphas_bar_prev = np.concatenate([[1.0], alphas_bar[:-1]])
    alphas = alphas_bar / alphas_bar_prev
    sub_betas = 1.0 - alphas
    sqrt_alphas_bar_prev = np.sqrt(alphas_bar_prev)

    sqrt_alphas_bar = np.sqrt(alphas_bar)
    sqrt_one_minus_alphas_bar = np.sqrt(1.0 - alphas_bar)
    posterior_var = sub_betas * (1.0 - alphas_bar_prev) / (1.0 - alphas_bar) * eta2
    posterior_logvar_clipped = np.log(
        np.clip(np.concatenate([posterior_var[1:2], posterior_var[1:]]), 1e-20, None)
    )
    sqrt_recip_alphas_bar = np.sqrt(1.0 / alphas_bar)
    sqrt_recip_m1_alphas_bar = np.sqrt(1.0 / alphas_bar - 1.0)

    posterior_mean_coef2 = (
        np.sqrt(1.0 - alphas_bar - eta2 * sub_betas)
        * np.sqrt(1.0 - alphas_bar_prev)
        / (1.0 - alphas_bar)
    )
    posterior_mean_coef1 = sqrt_alphas_bar_prev * (1.0 - np.sqrt(alphas) * posterior_mean_coef2)

    if model_var_type == "fixed-large":
        fixed_model_var = sub_betas
        fixed_model_logvar = np.log(
            np.clip(np.concatenate([posterior_var[1:2], sub_betas[1:]]), 1e-20, None)
        )
    else:
        fixed_model_var = posterior_var
        fixed_model_logvar = posterior_logvar_clipped

    return DiffusionCoefficients(
        betas=sub_betas,
        alphas_bar=alphas_bar,
        alphas_bar_prev=alphas_bar_prev,
        sqrt_alphas_bar=sqrt_alphas_bar,
        sqrt_one_minus_alphas_bar=sqrt_one_minus_alphas_bar,
        sqrt_recip_alphas_bar=sqrt_recip_alphas_bar,
        sqrt_recip_m1_alphas_bar=sqrt_recip_m1_alphas_bar,
        posterior_var=posterior_var,
        posterior_logvar_clipped=posterior_logvar_clipped,
        posterior_mean_coef1=posterior_mean_coef1,
        posterior_mean_coef2=posterior_mean_coef2,
        fixed_model_var=fixed_model_var,
        fixed_model_logvar=fixed_model_logvar,
    )

"""DDIM: eta-parameterized accelerated sampling on a timestep subsequence.

A DDIM here is just a :class:`GaussianDiffusion` whose coefficient tables are
re-derived on a subsequence of the training timesteps with the generalized
eta-scaled posterior (Song et al. 2020). The sampler core (the lax.scan in
``GaussianDiffusion.p_sample``) is shared; the only difference is the
``subsequence`` field, which remaps scan time -> model time inside
``p_mean_var`` (reference: ddim.py:96-113 wraps denoise_fn with a gather).

Reference semantics: /root/reference/ddim.py.
"""

from __future__ import annotations

import math
from typing import Sequence, Union

import jax.numpy as jnp
import numpy as np

from ..math import schedules as _sched
from .gaussian import GaussianDiffusion, _TABLE_FIELDS

__all__ = ["get_selection_schedule", "ddim_from_betas", "ddim_from_ddpm", "DDIM"]


def get_selection_schedule(schedule: str, size: int, timesteps: int) -> np.ndarray:
    """Subsequence of training timesteps to sample on (reference ddim.py:30-44).

    ``linear``: arange(0, T, T//S); ``quadratic``: round(linspace(0,
    sqrt(0.8 T), S)^2).
    """
    assert schedule in ("linear", "quadratic")
    if schedule == "linear":
        subsequence = np.arange(0, timesteps, timesteps // size, dtype=np.int64)
    else:
        subsequence = (
            np.power(np.linspace(0, math.sqrt(timesteps * 0.8), size), 2)
            .round()
            .astype(np.int64)
        )
    return subsequence


def ddim_from_betas(
    betas: np.ndarray,
    model_mean_type: str,
    model_var_type: str,
    loss_type: str,
    eta: float,
    subsequence: Union[np.ndarray, Sequence[int]],
    dtype=jnp.float32,
) -> GaussianDiffusion:
    """Build the restricted eta-generalized diffusion from a full beta schedule."""
    subsequence = np.asarray(subsequence, dtype=np.int64)
    # eta < 1 is only consistent with fixed-small variance; auto-convert like
    # the reference (ddim.py:53-59).
    if eta**2 != 1.0 and model_var_type != "fixed-small":
        model_var_type = "fixed-small"
    coefs = _sched.compute_ddim_coefficients(betas, model_var_type, eta, subsequence)
    # host-numpy tables: see GaussianDiffusion.create
    return GaussianDiffusion(
        **{f: np.asarray(getattr(coefs, f), dtype=dtype) for f in _TABLE_FIELDS},
        subsequence=np.asarray(subsequence, dtype=np.int32),
        model_mean_type=model_mean_type,
        model_var_type=model_var_type,
        loss_type=loss_type,
        timesteps=len(subsequence),
        eta=float(eta),
    )


def ddim_from_ddpm(
    diffusion: GaussianDiffusion,
    eta: float,
    subsequence: Union[np.ndarray, Sequence[int]],
    betas: np.ndarray = None,
) -> GaussianDiffusion:
    """Restrict a trained DDPM to a DDIM sampler (reference ddim.py:115-120).

    ``betas`` may be supplied explicitly; otherwise the full-precision f64
    schedule recorded at ``GaussianDiffusion.create`` time (``betas_f64``) is
    used, so this reference-signature path loses no precision. Only a
    hand-constructed diffusion lacking ``betas_f64`` falls back to
    round-tripping the f32 device table.
    """
    if betas is None:
        if diffusion.betas_f64 is not None:
            betas = np.asarray(diffusion.betas_f64, dtype=np.float64)
        else:
            betas = np.asarray(diffusion.betas, dtype=np.float64)
    return ddim_from_betas(
        betas,
        diffusion.model_mean_type,
        diffusion.model_var_type,
        diffusion.loss_type,
        eta=eta,
        subsequence=subsequence,
    )


# Alias so `DDIM(...)`-style call sites read like the reference API.
DDIM = ddim_from_betas

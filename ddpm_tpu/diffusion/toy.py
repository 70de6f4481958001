"""Toy (2-D) variant of the Gaussian diffusion.

Reference: ddpm_torch/toy/diffusion.py — identical process math, but:
  * no pixel clipping of pred_x_0 (the data is unbounded 2-D points;
    toy/diffusion.py:16-47 re-implements p_mean_var without the clamp);
  * the t=0 decoder term of the VLB uses the *continuous* Gaussian NLL
    instead of the discretized 8-bit decoder (toy/diffusion.py:52-64).

Here both differences are one hook each on :class:`GaussianDiffusion`:
``_clip`` (callers pass ``clip_denoised=False``; the override makes it
unconditional) and ``_decoder_nll``.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import struct

from ..math import schedules as _sched
from ..math.likelihood import continuous_gaussian_loglik
from .gaussian import GaussianDiffusion, _TABLE_FIELDS

__all__ = ["ToyGaussianDiffusion"]


@struct.dataclass
class ToyGaussianDiffusion(GaussianDiffusion):
    def _clip(self, x, clip_denoised):
        return x  # unbounded 2-D data: never clamp

    def _decoder_nll(self, x_0, model_mean, model_logvar):
        return -continuous_gaussian_loglik(x_0, model_mean, model_logvar)

    @classmethod
    def create(
        cls,
        betas: np.ndarray,
        model_mean_type: str = "eps",
        model_var_type: str = "fixed-small",
        loss_type: str = "mse",
        dtype=jnp.float32,
    ) -> "ToyGaussianDiffusion":
        coefs = _sched.compute_coefficients(betas, model_var_type)
        # host-numpy tables: see GaussianDiffusion.create
        return cls(
            **{f: np.asarray(getattr(coefs, f), dtype=dtype) for f in _TABLE_FIELDS},
            subsequence=None,
            model_mean_type=model_mean_type,
            model_var_type=model_var_type,
            loss_type=loss_type,
            timesteps=coefs.timesteps,
            eta=1.0,
        )

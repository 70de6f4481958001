"""Gaussian diffusion process: forward noising, reverse posterior math,
training losses, and on-device ancestral sampling.

TPU-native design notes
-----------------------
* ``GaussianDiffusion`` is a frozen ``flax.struct`` dataclass — a registered
  pytree whose leaves are the (T,)-shaped coefficient tables (f32 on device,
  precomputed in f64 numpy by :mod:`ddpm_tpu.math.schedules`) and whose
  mean/var/loss types are static (hashable) metadata. Instances pass straight
  through ``jax.jit`` boundaries with zero re-tracing as long as the static
  config is unchanged.
* The reference's Python sampling loop (ddpm_torch/diffusion.py:160-174,
  1000 sequential ``denoise_fn`` calls dispatched from the host) becomes a
  single ``lax.scan`` so the full reverse chain compiles to one XLA
  while-loop that never leaves the device.
* Randomness is explicit: every stochastic method takes a ``jax.random`` key.
  The per-step noise inside the scan is derived by folding the step index
  into the sampling key, which keeps the scan carry small.

Reference semantics: ddpm_torch/diffusion.py (class GaussianDiffusion).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..math import schedules as _sched
from ..math.likelihood import (
    discretized_gaussian_loglik,
    flat_mean,
    normal_kl,
)

DenoiseFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]

# hybrid-loss VLB weight (Improved-DDPM's lambda; Nichol & Dhariwal 2021 §3.2)
HYBRID_LAMBDA = 0.001

__all__ = ["GaussianDiffusion", "extract"]


def extract(table: jnp.ndarray, t: jnp.ndarray, ndim: int, dtype=jnp.float32) -> jnp.ndarray:
    """Gather per-timestep scalars and reshape for broadcasting.

    ``table`` is (T,), ``t`` is (B,) int32; the result is (B, 1, ..., 1) with
    ``ndim`` total dims (reference: GaussianDiffusion._extract,
    ddpm_torch/diffusion.py:75-84).
    """
    out = jnp.take(table, t, axis=0).astype(dtype)
    return out.reshape((-1,) + (1,) * (ndim - 1))


@struct.dataclass
class GaussianDiffusion:
    """Immutable diffusion-process definition.

    Array fields are per-timestep coefficient tables of shape (T,). When
    ``subsequence`` is set (DDIM), T is the subsequence length S and model
    calls are remapped through it back to the original training timesteps.
    """

    # --- pytree leaves (device arrays) ---
    betas: jnp.ndarray
    alphas_bar: jnp.ndarray
    sqrt_alphas_bar: jnp.ndarray
    sqrt_one_minus_alphas_bar: jnp.ndarray
    sqrt_recip_alphas_bar: jnp.ndarray
    sqrt_recip_m1_alphas_bar: jnp.ndarray
    posterior_var: jnp.ndarray
    posterior_logvar_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray
    fixed_model_var: jnp.ndarray
    fixed_model_logvar: jnp.ndarray
    subsequence: Optional[jnp.ndarray] = None

    # --- static metadata ---
    model_mean_type: str = struct.field(pytree_node=False, default="eps")
    model_var_type: str = struct.field(pytree_node=False, default="fixed-large")
    loss_type: str = struct.field(pytree_node=False, default="mse")
    timesteps: int = struct.field(pytree_node=False, default=1000)
    # eta kept for introspection/repr parity with the reference DDIM
    eta: float = struct.field(pytree_node=False, default=1.0)
    # Full-precision beta schedule, kept as a hashable tuple of Python floats
    # (static metadata must hash for jit treedef caching). `ddim_from_ddpm`
    # reads this so the reference-signature `from_ddpm(diffusion, ...)` path
    # (reference ddim.py:115-120) re-derives its subsequence tables from the
    # exact f64 schedule rather than the f32 device table.
    betas_f64: Optional[tuple] = struct.field(pytree_node=False, default=None)

    # ------------------------------------------------------------------ #
    # construction
    # ------------------------------------------------------------------ #

    @classmethod
    def create(
        cls,
        betas: np.ndarray,
        model_mean_type: str = "eps",
        model_var_type: str = "fixed-large",
        loss_type: str = "mse",
        dtype=jnp.float32,
    ) -> "GaussianDiffusion":
        """Build from a float64 beta schedule (see math/schedules.py)."""
        if model_mean_type not in ("mean", "x_0", "eps"):
            raise NotImplementedError(model_mean_type)
        if model_var_type not in ("learned", "fixed-small", "fixed-large"):
            raise NotImplementedError(model_var_type)
        if loss_type not in ("kl", "mse", "hybrid"):
            raise NotImplementedError(loss_type)
        if loss_type == "hybrid" and model_var_type != "learned":
            raise ValueError("hybrid loss trains a learned-variance (2C) head")
        coefs = _sched.compute_coefficients(betas, model_var_type)
        # Tables stay HOST numpy arrays: inside jit they become literal HLO
        # constants at trace time (they're ~KBs), which XLA constant-folds.
        # Storing them as device arrays instead makes every lowering fetch
        # them back from the device (mlir ir_constant -> ._value), which is
        # pathologically slow over a remote-attached TPU.
        return cls(
            **{f: np.asarray(getattr(coefs, f), dtype=dtype) for f in _TABLE_FIELDS},
            subsequence=None,
            model_mean_type=model_mean_type,
            model_var_type=model_var_type,
            loss_type=loss_type,
            timesteps=coefs.timesteps,
            eta=1.0,
            betas_f64=tuple(float(b) for b in np.asarray(betas, np.float64)),
        )

    # ------------------------------------------------------------------ #
    # q(x_t | x_0) and q(x_{t-1} | x_t, x_0)
    # ------------------------------------------------------------------ #

    def q_mean_var(self, x_0: jnp.ndarray, t: jnp.ndarray):
        mean = extract(self.sqrt_alphas_bar, t, x_0.ndim, x_0.dtype) * x_0
        var = extract(1.0 - self.alphas_bar, t, x_0.ndim, x_0.dtype)
        logvar = extract(jnp.log(1.0 - self.alphas_bar), t, x_0.ndim, x_0.dtype)
        return mean, var, logvar

    def q_sample(self, x_0: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray) -> jnp.ndarray:
        """Forward noising: x_t = sqrt(a-bar) x_0 + sqrt(1 - a-bar) eps."""
        coef1 = extract(self.sqrt_alphas_bar, t, x_0.ndim, x_0.dtype)
        coef2 = extract(self.sqrt_one_minus_alphas_bar, t, x_0.ndim, x_0.dtype)
        return coef1 * x_0 + coef2 * noise

    def q_posterior_mean_var(self, x_0: jnp.ndarray, x_t: jnp.ndarray, t: jnp.ndarray):
        nd, dt = x_0.ndim, x_0.dtype
        mean = (
            extract(self.posterior_mean_coef1, t, nd, dt) * x_0
            + extract(self.posterior_mean_coef2, t, nd, dt) * x_t
        )
        var = extract(self.posterior_var, t, nd, dt)
        logvar = extract(self.posterior_logvar_clipped, t, nd, dt)
        return mean, var, logvar

    # ------------------------------------------------------------------ #
    # p(x_{t-1} | x_t)
    # ------------------------------------------------------------------ #

    def _clip(self, x: jnp.ndarray, clip_denoised: bool) -> jnp.ndarray:
        """Hook so subclasses (toy 2-D process) can disable pixel clipping."""
        return jnp.clip(x, -1.0, 1.0) if clip_denoised else x

    def _pred_x_0_from_mean(self, x_t, mean, t):
        coef1 = extract(self.posterior_mean_coef1, t, x_t.ndim, x_t.dtype)
        coef2 = extract(self.posterior_mean_coef2, t, x_t.ndim, x_t.dtype)
        return mean / coef1 - coef2 / coef1 * x_t

    def _pred_x_0_from_eps(self, x_t, eps, t):
        coef1 = extract(self.sqrt_recip_alphas_bar, t, x_t.ndim, x_t.dtype)
        coef2 = extract(self.sqrt_recip_m1_alphas_bar, t, x_t.ndim, x_t.dtype)
        return coef1 * x_t - coef2 * eps

    def _model_t(self, t: jnp.ndarray) -> jnp.ndarray:
        """Remap sampler time to model (training) time for DDIM subsequences."""
        if self.subsequence is None:
            return t
        return jnp.take(self.subsequence, t, axis=0)

    def p_mean_var(
        self,
        denoise_fn: DenoiseFn,
        x_t: jnp.ndarray,
        t: jnp.ndarray,
        clip_denoised: bool,
    ):
        """Model-predicted reverse mean/variance (+ predicted x_0).

        Returns (model_mean, model_var, model_logvar, pred_x_0). For
        ``learned`` variance the model output carries 2C channels on the
        trailing (NHWC) axis: [mean-param, logvar].
        """
        out = denoise_fn(x_t, self._model_t(t))

        if self.model_var_type == "learned":
            out, model_logvar = jnp.split(out, 2, axis=-1)
            model_var = jnp.exp(model_logvar)
        elif self.model_var_type in ("fixed-small", "fixed-large"):
            if out.shape[-1] == 2 * x_t.shape[-1]:
                # A learned-variance (2C-head) checkpoint driven through a
                # fixed-variance process — e.g. DDIM with eta<1, which
                # force-converts to fixed-small (diffusion/ddim.py:58-60):
                # use the eps/mean-param half and drop the predicted
                # logvar, the Improved-DDPM strided-sampling convention.
                # Deciding here (shape-driven) covers every caller —
                # samplers, progressive chains, bpd evaluation — with no
                # per-call-site adapter. The reference cannot express this
                # at all (its learned path is unconstructible; see
                # scripts/check_diffusion_parity.py).
                out = out[..., : x_t.shape[-1]]
            model_var = extract(self.fixed_model_var, t, x_t.ndim, x_t.dtype)
            model_logvar = extract(self.fixed_model_logvar, t, x_t.ndim, x_t.dtype)
        else:
            raise NotImplementedError(self.model_var_type)

        if self.model_mean_type == "mean":
            pred_x_0 = self._clip(self._pred_x_0_from_mean(x_t, out, t), clip_denoised)
            model_mean = out
        elif self.model_mean_type == "x_0":
            pred_x_0 = self._clip(out, clip_denoised)
            model_mean, _, _ = self.q_posterior_mean_var(pred_x_0, x_t, t)
        elif self.model_mean_type == "eps":
            pred_x_0 = self._clip(self._pred_x_0_from_eps(x_t, out, t), clip_denoised)
            model_mean, _, _ = self.q_posterior_mean_var(pred_x_0, x_t, t)
        else:
            raise NotImplementedError(self.model_mean_type)

        return model_mean, model_var, model_logvar, pred_x_0

    # ------------------------------------------------------------------ #
    # sampling
    # ------------------------------------------------------------------ #

    def p_sample_step(
        self,
        denoise_fn: DenoiseFn,
        x_t: jnp.ndarray,
        t: jnp.ndarray,
        key: jax.Array,
        clip_denoised: bool = True,
        return_pred: bool = False,
    ):
        """One reverse step: x_{t-1} = mu + 1[t>0] * sigma * eps."""
        model_mean, _, model_logvar, pred_x_0 = self.p_mean_var(
            denoise_fn, x_t, t, clip_denoised=clip_denoised
        )
        noise = jax.random.normal(key, x_t.shape, x_t.dtype)
        nonzero = (t > 0).astype(x_t.dtype).reshape((-1,) + (1,) * (x_t.ndim - 1))
        sample = model_mean + nonzero * jnp.exp(0.5 * model_logvar) * noise
        return (sample, pred_x_0) if return_pred else sample

    def p_sample(
        self,
        denoise_fn: DenoiseFn,
        shape: Tuple[int, ...],
        key: jax.Array,
        noise: Optional[jnp.ndarray] = None,
        clip_denoised: bool = True,
        dtype=jnp.float32,
    ) -> jnp.ndarray:
        """Full reverse chain as one on-device ``lax.scan``.

        ``key`` seeds both the initial x_T draw (when ``noise`` is None) and
        every per-step noise injection, mirroring the single-Generator
        semantics of the reference's seeded ``p_sample``
        (ddpm_torch/diffusion.py:160-174).
        """
        T = self.timesteps
        init_key, step_key = jax.random.split(key)
        if noise is None:
            x = jax.random.normal(init_key, shape, dtype)
        else:
            x = noise.astype(dtype)
        B = x.shape[0]

        def body(x, ti):
            t = jnp.full((B,), ti, dtype=jnp.int32)
            k = jax.random.fold_in(step_key, ti)
            return self.p_sample_step(denoise_fn, x, t, k, clip_denoised=clip_denoised), None

        x, _ = jax.lax.scan(body, x, jnp.arange(T - 1, -1, -1, dtype=jnp.int32))
        return x

    def p_sample_progressive(
        self,
        denoise_fn: DenoiseFn,
        shape: Tuple[int, ...],
        key: jax.Array,
        noise: Optional[jnp.ndarray] = None,
        pred_freq: int = 10,
        clip_denoised: bool = True,
        dtype=jnp.float32,
    ):
        """Reverse chain that snapshots pred_x_0 every ``pred_freq`` steps.

        Returns (x_0 sample, preds) with preds shaped (T//pred_freq, B, ...),
        ordered from cleanest to noisiest — index 0 holds the final (t≈0)
        pred_x_0, matching the reference's decrementing snapshot index
        (ddpm_torch/diffusion.py:176-198). Iterate it in reverse to animate
        noise → image.
        """
        T = self.timesteps
        L = T // pred_freq
        init_key, step_key = jax.random.split(key)
        if noise is None:
            x = jax.random.normal(init_key, shape, dtype)
        else:
            x = noise.astype(dtype)
        B = x.shape[0]
        preds = jnp.zeros((L,) + x.shape, dtype)

        def body(carry, ti):
            x, preds = carry
            t = jnp.full((B,), ti, dtype=jnp.int32)
            k = jax.random.fold_in(step_key, ti)
            x, pred = self.p_sample_step(
                denoise_fn, x, t, k, clip_denoised=clip_denoised, return_pred=True
            )
            snap = (ti + 1) % pred_freq == 0
            idx = jnp.clip(ti // pred_freq, 0, L - 1)
            preds = jax.lax.cond(
                snap,
                lambda p: jax.lax.dynamic_update_slice_in_dim(p, pred[None], idx, axis=0),
                lambda p: p,
                preds,
            )
            return (x, preds), None

        (x, preds), _ = jax.lax.scan(
            body, (x, preds), jnp.arange(T - 1, -1, -1, dtype=jnp.int32)
        )
        return x, preds

    # ------------------------------------------------------------------ #
    # losses
    # ------------------------------------------------------------------ #

    def _decoder_nll(self, x_0, model_mean, model_logvar):
        """Negative log-likelihood of the t=0 decoder (discretized pixels)."""
        return -discretized_gaussian_loglik(x_0, model_mean, log_scale=0.5 * model_logvar)

    def _loss_term_bpd(
        self,
        denoise_fn: DenoiseFn,
        x_0: jnp.ndarray,
        x_t: jnp.ndarray,
        t: jnp.ndarray,
        clip_denoised: bool,
        return_pred: bool = False,
    ):
        """Per-example VLB term L_t in bits/dim: KL for t>0, decoder NLL at t=0."""
        true_mean, _, true_logvar = self.q_posterior_mean_var(x_0=x_0, x_t=x_t, t=t)
        model_mean, _, model_logvar, pred_x_0 = self.p_mean_var(
            denoise_fn, x_t, t, clip_denoised=clip_denoised
        )
        kl = flat_mean(normal_kl(true_mean, true_logvar, model_mean, model_logvar))
        kl = kl / math.log(2.0)
        decoder_nll = flat_mean(self._decoder_nll(x_0, model_mean, model_logvar))
        decoder_nll = decoder_nll / math.log(2.0)
        output = jnp.where(t > 0, kl, decoder_nll)
        return (output, pred_x_0) if return_pred else output

    def train_losses(
        self,
        denoise_fn: DenoiseFn,
        x_0: jnp.ndarray,
        t: jnp.ndarray,
        noise: jnp.ndarray,
    ) -> jnp.ndarray:
        """Per-example training loss, shape (B,).

        ``kl``: VLB bits/dim term. ``mse``: unweighted mean-squared error
        against the target implied by ``model_mean_type``.
        """
        x_t = self.q_sample(x_0, t, noise=noise)
        if self.loss_type == "kl":
            return self._loss_term_bpd(
                denoise_fn, x_0=x_0, x_t=x_t, t=t, clip_denoised=False
            )
        elif self.loss_type == "hybrid":
            # Improved-DDPM hybrid objective (Nichol & Dhariwal 2021 §3.2):
            # L_simple + lambda * L_vlb with the VLB's mean input FROZEN, so
            # the mse term alone trains the mean-param half and the VLB term
            # alone trains the learned-logvar half. Why this exists: a pure
            # kl loss (the reference's only learned-variance objective,
            # diffusion.py:224-227, reproduced verbatim above) starves the
            # mean — the KL's gradient wrt the mean carries the squared
            # posterior eps-coefficient over the model variance, measured
            # 1e4x smaller than the logvar gradient at init (round 5: a
            # kl-trained 2C model plateaus its VLB with eps-mse pinned at
            # 1.0 and FID ~562, i.e. pure noise). Framework extension: the
            # reference cannot train a sampling-quality 2C model at all.
            model_out = denoise_fn(x_t, self._model_t(t))
            mean_param, logvar = jnp.split(model_out, 2, axis=-1)
            if self.model_mean_type == "mean":
                target = self.q_posterior_mean_var(x_0=x_0, x_t=x_t, t=t)[0]
            elif self.model_mean_type == "x_0":
                target = x_0
            elif self.model_mean_type == "eps":
                target = noise
            else:
                raise NotImplementedError(self.model_mean_type)
            simple = flat_mean(jnp.square(target - mean_param))
            frozen = jnp.concatenate(
                [jax.lax.stop_gradient(mean_param), logvar], axis=-1
            )
            vlb = self._loss_term_bpd(
                lambda *_: frozen, x_0=x_0, x_t=x_t, t=t, clip_denoised=False
            )
            return simple + HYBRID_LAMBDA * vlb
        elif self.loss_type == "mse":
            assert self.model_var_type != "learned"
            if self.model_mean_type == "mean":
                target = self.q_posterior_mean_var(x_0=x_0, x_t=x_t, t=t)[0]
            elif self.model_mean_type == "x_0":
                target = x_0
            elif self.model_mean_type == "eps":
                target = noise
            else:
                raise NotImplementedError(self.model_mean_type)
            model_out = denoise_fn(x_t, self._model_t(t))
            return flat_mean(jnp.square(target - model_out))
        else:
            raise NotImplementedError(self.loss_type)

    # ------------------------------------------------------------------ #
    # bits-per-dim evaluation
    # ------------------------------------------------------------------ #

    def _prior_bpd(self, x_0: jnp.ndarray) -> jnp.ndarray:
        B, T = x_0.shape[0], self.timesteps
        t = jnp.full((B,), T - 1, dtype=jnp.int32)
        T_mean, _, T_logvar = self.q_mean_var(x_0=x_0, t=t)
        kl_prior = normal_kl(T_mean, T_logvar, 0.0, 0.0)
        return flat_mean(kl_prior) / math.log(2.0)

    def calc_all_bpd(
        self,
        denoise_fn: DenoiseFn,
        x_0: jnp.ndarray,
        key: jax.Array,
        clip_denoised: bool = True,
    ):
        """Full-chain VLB: one scan over all T terms.

        Returns (total_bpd (B,), losses (B, T), prior_bpd (B,), mses (B, T)),
        matching ddpm_torch/diffusion.py:252-268.
        """
        B, T = x_0.shape[0], self.timesteps

        def body(_, ti):
            t = jnp.full((B,), ti, dtype=jnp.int32)
            k = jax.random.fold_in(key, ti)
            eps = jax.random.normal(k, x_0.shape, x_0.dtype)
            x_t = self.q_sample(x_0, t=t, noise=eps)
            loss, pred_x_0 = self._loss_term_bpd(
                denoise_fn, x_0, x_t=x_t, t=t, clip_denoised=clip_denoised, return_pred=True
            )
            mse = flat_mean(jnp.square(pred_x_0 - x_0))
            return None, (loss, mse)

        _, (losses, mses) = jax.lax.scan(
            body, None, jnp.arange(T - 1, -1, -1, dtype=jnp.int32)
        )
        # scan stacked in descending-t order; flip to index losses[:, t] by t
        losses = jnp.flip(losses, axis=0).T  # (B, T)
        mses = jnp.flip(mses, axis=0).T
        prior_bpd = self._prior_bpd(x_0)
        total_bpd = jnp.sum(losses, axis=1) + prior_bpd
        return total_bpd, losses, prior_bpd, mses


_TABLE_FIELDS = (
    "betas",
    "alphas_bar",
    "sqrt_alphas_bar",
    "sqrt_one_minus_alphas_bar",
    "sqrt_recip_alphas_bar",
    "sqrt_recip_m1_alphas_bar",
    "posterior_var",
    "posterior_logvar_clipped",
    "posterior_mean_coef1",
    "posterior_mean_coef2",
    "fixed_model_var",
    "fixed_model_logvar",
)

"""NN building blocks shared by the models (flax.linen, NHWC layout).

Initialization parity: the reference re-implements Linear/Conv2d to carry a
TF variance-scaling(fan_avg, uniform) initializer with an ``init_scale``
knob, where scale 0 is approximated by 1e-10 (ddpm_torch/modules.py:11-18).
``variance_scaling_init`` reproduces that exactly; bias init is zeros.

Padding parity: the reference's SamePad2d computes TF-style asymmetric
padding (floor on top/left, ceil on bottom/right, ddpm_torch/modules.py:
126-160). In NHWC flax that is simply ``padding="SAME"`` on the conv — XLA
implements the identical rule, so no separate pad module is required.
"""

from __future__ import annotations

import math
from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = [
    "variance_scaling_init",
    "DEFAULT_INIT",
    "ZERO_INIT_SCALE",
    "get_timestep_embedding",
    "GroupNorm32",
    "silu",
    "leaky_relu02",
]

ZERO_INIT_SCALE = 1e-10


def variance_scaling_init(scale: float = 1.0) -> Callable:
    """TF variance-scaling(fan_avg, uniform); scale<=0 means (near-)zero init."""
    return nn.initializers.variance_scaling(
        scale or ZERO_INIT_SCALE, mode="fan_avg", distribution="uniform"
    )


DEFAULT_INIT = variance_scaling_init(1.0)


def get_timestep_embedding(timesteps: jnp.ndarray, embed_dim: int, dtype=jnp.float32):
    """fairseq-style sinusoidal timestep embedding.

    freq_i = exp(-i * ln(10000) / (half - 1)); output = [sin(t*f), cos(t*f)],
    zero-padded if ``embed_dim`` is odd (reference: ddpm_torch/functions.py:10-26).
    """
    half_dim = embed_dim // 2
    log_scale = math.log(10000.0) / (half_dim - 1)
    freqs = jnp.exp(-log_scale * jnp.arange(half_dim, dtype=dtype))
    args = timesteps.reshape(-1).astype(dtype)[:, None] * freqs[None, :]
    embed = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=1)
    if embed_dim % 2 == 1:
        embed = jnp.pad(embed, ((0, 0), (0, 1)))
    return embed


class _GNParams(nn.Module):
    """Parameter holder reproducing nn.GroupNorm's param tree
    (``GroupNorm_0/{scale,bias}``) so fused and unfused paths share
    checkpoints (scripts/convert_checkpoint.py relies on these names)."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return scale, bias


class GroupNorm32(nn.Module):
    """GroupNorm(32 groups, eps 1e-6) computed in f32 regardless of the
    compute dtype (reference default normalizer: unet.py:18-20).

    ``with_silu`` folds the SiLU that always follows the norm in this model
    family into the same op, and ``drop_rate`` folds in the dropout that
    follows the second norm of every residual block. ``fuse=True`` routes
    through the single-pass Pallas kernel (ops/pallas/group_norm.py) on TPU —
    one HBM read + one HBM write per direction instead of separate
    stats/normalize/activation/mask passes, with the dropout mask drawn from
    the on-chip hardware PRNG (the unfused threefry mask generation alone
    costs ~40% of the train step); off-TPU or for oversized slabs it
    evaluates a numerically matching jnp path.
    """

    num_groups: int = 32
    epsilon: float = 1e-6
    dtype: jnp.dtype = jnp.float32
    with_silu: bool = False
    drop_rate: float = 0.0
    fuse: bool = False
    # Compute the group statistics (fwd sums and bwd cross-sums) with the
    # Pallas kernels in ops/pallas/gn_stats.py. At op level those kernels
    # beat XLA's reduce emitter ~2.3x (3.0 vs 6.8 ms/step across the CIFAR
    # UNet), but each custom call forces its operands out of XLA's
    # batch-minor conv layout ({0,3,2,1}) into the default layout, adding
    # ~4.7 ms/step of transpose copies plus ~3 ms of lost fusion — a net
    # 21% end-to-end regression (docs/performance.md round-2 ledger). Kept
    # as an opt-in for shapes/models where the layout tax doesn't apply.
    pallas_stats: bool = False

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True, stats=None, shift=None):
        drop = self.drop_rate if not deterministic else 0.0
        if stats is not None:
            # Stats supplied by the producing convolution's epilogue
            # (ops/pallas/conv_gn.py): no re-read of x for E[x], E[x^2].
            # ``shift`` is the per-(batch, channel) constant added before
            # normalizing (the ResidualBlock's broadcast t-embedding); its
            # effect on the group statistics is folded in algebraically.
            from ..ops.pallas.conv_gn import gn_from_stats

            scale, bias = _GNParams(x.shape[-1], name="GroupNorm_0")()
            s1, s2 = stats
            y = gn_from_stats(
                x, s1, s2, scale, bias, self.num_groups, self.epsilon, shift=shift
            ).astype(self.dtype)
            if self.with_silu:
                y = nn.silu(y)
            if drop > 0.0:
                y = nn.Dropout(self.drop_rate, deterministic=False)(y)
            return y
        if self.fuse:
            from ..ops.pallas.group_norm import fused_group_norm_silu

            seed = None
            if drop > 0.0:
                key = self.make_rng("dropout")
                seed = jax.lax.convert_element_type(
                    jax.random.key_data(key).reshape(-1)[0], jnp.int32
                )
            scale, bias = _GNParams(x.shape[-1], name="GroupNorm_0")()
            B, H, W, C = x.shape
            y = fused_group_norm_silu(
                x.reshape(B, H * W, C),
                scale,
                bias,
                self.num_groups,
                self.epsilon,
                self.with_silu,
                False,
                drop,
                seed,
            ).reshape(B, H, W, C)
            return y.astype(self.dtype)
        # Manual GN in affine-rearranged form: y = x * a + b with per-group
        # a = rsigma * scale and b = bias - mu * rsigma * scale, statistics
        # in f32, output written directly in the compute dtype. Numerically
        # identical to nn.GroupNorm (same mean/E[x^2] variance, same eps
        # placement) but XLA materializes no f32 normalized tensor, which is
        # worth ~15% of the whole CIFAR-10 train step in bf16.
        B, H, W, C = x.shape
        G, cg = self.num_groups, x.shape[-1] // self.num_groups
        scale, bias = _GNParams(C, name="GroupNorm_0")()
        if self.pallas_stats and jax.default_backend() == "tpu":
            # Opt-in: statistics (and their backward cross-sums) via the
            # Pallas kernels; the affine apply stays jnp so it fuses into
            # the consumer conv. See the pallas_stats field note for why
            # this loses end-to-end on the UNet despite faster kernels.
            from ..ops.pallas.gn_stats import group_norm_affine, supports

            if supports((B, H * W, C), itemsize=jnp.dtype(x.dtype).itemsize):
                y = group_norm_affine(
                    x.reshape(B, H * W, C), scale, bias, G,
                    self.epsilon, jnp.dtype(self.dtype),
                ).reshape(B, H, W, C)
                if self.with_silu:
                    y = nn.silu(y)
                if drop > 0.0:
                    y = nn.Dropout(self.drop_rate, deterministic=False)(y)
                return y
        xf = x.astype(jnp.float32).reshape(B, H * W, G, cg)
        mu = jnp.mean(xf, axis=(1, 3), keepdims=True)
        # clamp: E[x^2] - mu^2 can round negative under f32 cancellation for
        # near-constant large-magnitude groups (flax clamps the same way)
        var = jnp.maximum(
            jnp.mean(jnp.square(xf), axis=(1, 3), keepdims=True) - mu * mu, 0.0
        )
        rs = jax.lax.rsqrt(var + self.epsilon)
        sg = scale.reshape(1, 1, G, cg)
        a = rs * sg
        b = bias.reshape(1, 1, G, cg) - mu * a
        y = (xf * a + b).reshape(B, H, W, C).astype(self.dtype)
        if self.with_silu:
            # SiLU in the compute dtype: applying it in f32 before the cast
            # costs ~6% of the whole train step (XLA materializes the f32
            # activation for the backward). The fused Pallas path applies
            # SiLU in f32 in-register at no cost, so the two paths differ by
            # one bf16 rounding; parity in f32 is exact either way.
            y = nn.silu(y)
        if drop > 0.0:
            y = nn.Dropout(self.drop_rate, deterministic=False)(y)
        return y


def silu(x):
    return nn.silu(x)


def leaky_relu02(x):
    """LeakyReLU with the reference toy model's 0.02 slope (toy_model.py:14)."""
    return nn.leaky_relu(x, negative_slope=0.02)

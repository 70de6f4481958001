"""Temporal MLP decoder for the 2-D toy datasets.

Mirrors ddpm_torch/toy/toy_model.py: LayerNorm / LeakyReLU(0.02)
pre-activation residual layers with additive timestep-embedding injection.

Parity note: the reference builds its stack as
``Sequential(*([TemporalLayer(...)] * num_temporal_layers))``
(toy_model.py:49-50) — the *same module instance* repeated, i.e. one set of
weights applied ``num_temporal_layers`` times. We reproduce that weight
tying by instantiating a single ``TemporalLayer`` and looping it.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..nn.modules import DEFAULT_INIT, get_timestep_embedding, leaky_relu02

__all__ = ["Decoder", "TemporalLayer"]


class TemporalLayer(nn.Module):
    """Pre-activation residual MLP block (toy_model.py:17-36)."""

    out_features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t_emb):
        in_f = x.shape[-1]
        skip = x
        if in_f != self.out_features:
            skip = nn.Dense(
                self.out_features, use_bias=False, kernel_init=DEFAULT_INIT,
                dtype=self.dtype, name="skip",
            )(x)
        h = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        h = nn.Dense(
            self.out_features, use_bias=False, kernel_init=DEFAULT_INIT,
            dtype=self.dtype, name="fc1",
        )(leaky_relu02(h))
        h = h + nn.Dense(
            self.out_features, kernel_init=DEFAULT_INIT, dtype=self.dtype, name="enc"
        )(t_emb)
        h = nn.LayerNorm(dtype=self.dtype, name="norm2")(h)
        h = nn.Dense(
            self.out_features, use_bias=False, kernel_init=DEFAULT_INIT,
            dtype=self.dtype, name="fc2",
        )(leaky_relu02(h))
        return h + skip


class Decoder(nn.Module):
    """in_fc -> (one tied TemporalLayer, applied N times) -> norm -> out_fc
    (toy_model.py:39-62)."""

    in_features: int = 2
    mid_features: int = 128
    num_temporal_layers: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t, *, train: bool = False):  # train: step-API parity
        t_emb = get_timestep_embedding(t, self.mid_features, dtype=jnp.float32)
        t_emb = leaky_relu02(
            nn.Dense(
                self.mid_features, kernel_init=DEFAULT_INIT, dtype=self.dtype, name="t_proj"
            )(t_emb)
        )
        h = nn.Dense(
            self.mid_features, use_bias=False, kernel_init=DEFAULT_INIT,
            dtype=self.dtype, name="in_fc",
        )(x.astype(self.dtype))
        layer = TemporalLayer(self.mid_features, dtype=self.dtype, name="temporal")
        for _ in range(self.num_temporal_layers):
            h = layer(h, t_emb)
        h = nn.LayerNorm(dtype=self.dtype, name="out_norm")(h)
        h = nn.Dense(self.in_features, kernel_init=DEFAULT_INIT, dtype=self.dtype, name="out_fc")(h)
        return h.astype(jnp.float32)

"""Pallas kernel tests (CPU interpreter mode via the auto-interpret flag)."""

import jax
import jax.numpy as jnp
import numpy as np

from ddpm_tpu.ops.attention import _dense_attention
from ddpm_tpu.ops.pallas.flash_attention import flash_attention


def test_flash_matches_dense():
    key = jax.random.key(0)
    B, N, C = 2, 256, 128
    q, k, v = (
        jax.random.normal(jax.random.fold_in(key, i), (B, N, C), jnp.float32)
        for i in range(3)
    )
    dense = _dense_attention(q, k, v)
    flash = flash_attention(q, k, v, block_q=128, block_k=128)
    np.testing.assert_allclose(np.asarray(flash), np.asarray(dense), atol=2e-5)


def test_flash_single_block():
    key = jax.random.key(1)
    B, N, C = 1, 128, 128
    q, k, v = (
        jax.random.normal(jax.random.fold_in(key, i), (B, N, C), jnp.float32)
        for i in range(3)
    )
    dense = _dense_attention(q, k, v)
    flash = flash_attention(q, k, v, block_q=128, block_k=128)
    np.testing.assert_allclose(np.asarray(flash), np.asarray(dense), atol=2e-5)

"""Single-head full self-attention over spatial tokens.

The reference materializes the (HW x HW) attention matrix with einsums in
NCHW (ddpm_torch/models/unet.py:43-51). Here attention operates on NHWC
feature maps flattened to (B, N=H*W, C) token form — both einsums are plain
batched matmuls that map directly onto the MXU, and the softmax runs in f32
for bf16 safety.

The sequence lengths in this model family are small (N <= 4096 at the
attention resolutions of every reference config), so the dense
materialization fits comfortably in VMEM-sized tiles and XLA's fusion is
already near roofline; a Pallas flash-attention path (ops/pallas/) is
provided for the large-N regime and can be toggled via ``use_flash``.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["spatial_attention"]


def _dense_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """q, k, v: (B, N, C) single-head. Returns (B, N, C)."""
    C = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(C, jnp.float32))
    logits = jnp.einsum(
        "bnc,bmc->bnm", q, k, preferred_element_type=jnp.float32
    ) * scale
    weights = jnp.asarray(
        jnp.exp(logits - jnp.max(logits, axis=-1, keepdims=True)), jnp.float32
    )
    weights = weights / jnp.sum(weights, axis=-1, keepdims=True)
    out = jnp.einsum(
        "bnm,bmc->bnc", weights.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    return out.astype(v.dtype)


def spatial_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, use_flash: bool = False
) -> jnp.ndarray:
    """Attention over flattened H*W tokens; q/k/v are (B, H, W, C) NHWC."""
    B, H, W, C = q.shape
    qf, kf, vf = (a.reshape(B, H * W, C) for a in (q, k, v))
    if use_flash:
        from .pallas.flash_attention import flash_attention

        out = flash_attention(qf, kf, vf)
    else:
        out = _dense_attention(qf, kf, vf)
    return out.reshape(B, H, W, C)

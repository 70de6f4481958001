"""Blockwise (flash) attention Pallas kernel for spatial self-attention.

The reference materializes the full (HW x HW) attention matrix
(ddpm_torch/models/unet.py:43-51). For the resolutions in the reference
configs (<= 16x16 = 256 tokens at the attention levels) a dense softmax is
already VMEM-resident and MXU-bound, so the dense path (ops/attention.py) is
the default. This kernel is the large-N path (e.g. attention at 64x64 = 4096
tokens): O(N) memory via the standard streaming-softmax recurrence, never
materializing the (N, N) matrix in HBM.

Layout: single-head (B, N, C) with C as the MXU lane dimension. Grid is
(B, N/BQ, N/BK); the running max / normalizer / output accumulator persist in
VMEM scratch across the innermost (K-block) grid steps, with the rescaling
trick applied when a new block raises the running max. All matmuls hit the
MXU in f32 accumulation (preferred_element_type).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flash_attention"]

_NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *, scale, nk):
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]  # (BQ, C)
    k = k_ref[0]  # (BK, C)
    v = v_ref[0]  # (BK, C)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (BQ, BK)

    m_prev = m_scr[:]  # (BQ, 1)
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    correction = jnp.exp(m_prev - m_new)

    p = jnp.exp(s - m_new)  # (BQ, BK)
    l_new = correction * l_scr[:] + jnp.sum(p, axis=1, keepdims=True)
    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    acc_scr[:] = correction * acc_scr[:] + pv
    m_scr[:] = m_new
    l_scr[:] = l_new

    @pl.when(ik == nk - 1)
    def _finalize():
        o_ref[0] = (acc_scr[:] / l_scr[:]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "interpret"))
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    block_q: int = 256,
    block_k: int = 256,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Single-head attention over (B, N, C); returns (B, N, C).

    N must be divisible by the block sizes (spatial token counts here are
    powers of two); C should be a multiple of 128 for lane alignment (all
    reference attention widths are: 128/256/512). ``interpret`` defaults to
    True off-TPU so tests exercise the kernel on the CPU interpreter.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, N, C = q.shape
    block_q = min(block_q, N)
    block_k = min(block_k, N)
    assert N % block_q == 0 and N % block_k == 0, (N, block_q, block_k)
    nq, nk = N // block_q, N // block_k
    scale = 1.0 / math.sqrt(C)

    grid = (B, nq, nk)
    kernel = functools.partial(_flash_kernel, scale=scale, nk=nk)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, N, C), q.dtype),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, block_q, C), lambda b, iq, ik: (b, iq, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (1, block_k, C), lambda b, iq, ik: (b, ik, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (1, block_k, C), lambda b, iq, ik: (b, ik, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, block_q, C), lambda b, iq, ik: (b, iq, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((block_q, 1), jnp.float32),  # running max
                pltpu.VMEM((block_q, 1), jnp.float32),  # running normalizer
                pltpu.VMEM((block_q, C), jnp.float32),  # output accumulator
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * N * N * C,
            bytes_accessed=(3 * B * N * C + B * N * C) * q.dtype.itemsize,
            transcendentals=B * N * N,
        ),
        interpret=interpret,
    )(q, k, v)

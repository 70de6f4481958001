"""Blockwise (flash) attention Pallas kernels — forward AND backward.

The reference materializes the full (HW x HW) attention matrix
(ddpm_torch/models/unet.py:43-51). For the resolutions in the reference
configs (<= 16x16 = 256 tokens at the attention levels) a dense softmax is
already VMEM-resident and MXU-bound, so the dense path (ops/attention.py) is
the default. This kernel is the large-N path (e.g. attention at 64x64 = 4096
tokens): O(N) memory via the standard streaming-softmax recurrence, never
materializing the (N, N) matrix in HBM.

Training is supported through a custom VJP: the forward additionally saves
the per-row logsumexp, and two backward kernels recompute the probability
blocks on the fly (dq over k-blocks; dk/dv over q-blocks) — the
recompute-instead-of-store trade that makes flash attention O(N) in memory
both ways.

Layout: single-head (B, N, C) with C as the MXU lane dimension. Running
max / normalizer / accumulators persist in VMEM scratch across the innermost
grid dimension, with the rescaling trick applied when a new block raises the
running max. All matmuls hit the MXU with f32 accumulation
(preferred_element_type).
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


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr, *, scale, nk):
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
        # (BQ, 1) sublane orientation — matches the scratch, no transpose
        lse_ref[0] = m_scr[:] + jnp.log(l_scr[:])


def _fwd_call(q, k, v, block_q, block_k, interpret):
    B, N, C = q.shape
    nq, nk = N // block_q, N // block_k
    scale = 1.0 / math.sqrt(C)
    kernel = functools.partial(_fwd_kernel, scale=scale, nk=nk)
    return pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((B, N, C), q.dtype),
            jax.ShapeDtypeStruct((B, N, 1), jnp.float32),
        ],
        grid_spec=pl.GridSpec(
            grid=(B, nq, nk),
            in_specs=[
                pl.BlockSpec((1, block_q, C), lambda b, iq, ik: (b, iq, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_k, C), lambda b, iq, ik: (b, ik, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_k, C), lambda b, iq, ik: (b, ik, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, block_q, C), lambda b, iq, ik: (b, iq, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_q, 1), lambda b, iq, ik: (b, iq, 0), memory_space=pltpu.VMEM),
            ],
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
            bytes_accessed=(4 * B * N * C) * q.dtype.itemsize,
            transcendentals=B * N * N,
        ),
        interpret=interpret,
    )(q, k, v)


def _recompute_p_ds(q, k, v, do, lse, delta, scale):
    """Shared backward-block math: probabilities p and softmax-grad ds."""
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (BQ, BK)
    p = jnp.exp(s - lse)  # (BQ, BK) — exact softmax via saved lse (BQ, 1)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (BQ, BK)
    ds = p * (dp - delta) * scale  # (BQ, BK); delta is (BQ, 1)
    return p, ds


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, dq_scr, *, scale, nk):
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    _, ds = _recompute_p_ds(
        q_ref[0], k_ref[0], v_ref[0], do_ref[0], lse_ref[0], delta_ref[0], scale
    )
    dq_scr[:] += jax.lax.dot_general(
        ds.astype(k_ref.dtype), k_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(ik == nk - 1)
    def _finalize():
        dq_ref[0] = dq_scr[:].astype(dq_ref.dtype)


def _bwd_dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref, dk_scr, dv_scr, *, scale, nq
):
    iq = pl.program_id(2)

    @pl.when(iq == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    q, do = q_ref[0], do_ref[0]
    p, ds = _recompute_p_ds(q, k_ref[0], v_ref[0], do, lse_ref[0], delta_ref[0], scale)
    # dv += p^T dO ; dk += ds^T q   (contract over the BQ dimension)
    dv_scr[:] += jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dk_scr[:] += jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(iq == nq - 1)
    def _finalize():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _bwd_call(q, k, v, o, lse, do, block_q, block_k, interpret):
    B, N, C = q.shape
    nq, nk = N // block_q, N // block_k
    scale = 1.0 / math.sqrt(C)
    # delta_i = sum_c dO_ic * O_ic — tiny elementwise pass, XLA fuses it
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1, keepdims=True)

    q_spec = pl.BlockSpec((1, block_q, C), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM)
    k_spec = pl.BlockSpec((1, block_k, C), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, nk=nk),
        out_shape=jax.ShapeDtypeStruct((B, N, C), q.dtype),
        grid_spec=pl.GridSpec(
            grid=(B, nq, nk),
            in_specs=[q_spec, k_spec, k_spec, q_spec, row_spec, row_spec],
            out_specs=q_spec,
            scratch_shapes=[pltpu.VMEM((block_q, C), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v, do, lse, delta)

    # k-major grid: k/v blocks are indexed by the middle (parallel) axis,
    # q/do/lse/delta stream along the innermost (arbitrary) axis
    qT_spec = pl.BlockSpec((1, block_q, C), lambda b, j, i: (b, i, 0), memory_space=pltpu.VMEM)
    rowT_spec = pl.BlockSpec((1, block_q, 1), lambda b, j, i: (b, i, 0), memory_space=pltpu.VMEM)
    kT_spec = pl.BlockSpec((1, block_k, C), lambda b, j, i: (b, j, 0), memory_space=pltpu.VMEM)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, nq=nq),
        out_shape=[
            jax.ShapeDtypeStruct((B, N, C), k.dtype),
            jax.ShapeDtypeStruct((B, N, C), v.dtype),
        ],
        grid_spec=pl.GridSpec(
            grid=(B, nk, nq),
            in_specs=[qT_spec, kT_spec, kT_spec, qT_spec, rowT_spec, rowT_spec],
            out_specs=[kT_spec, kT_spec],
            scratch_shapes=[
                pltpu.VMEM((block_k, C), jnp.float32),
                pltpu.VMEM((block_k, C), jnp.float32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v, do, lse, delta)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash(q, k, v, block_q, block_k, interpret):
    o, _ = _fwd_call(q, k, v, block_q, block_k, interpret)
    return o


def _flash_fwd_rule(q, k, v, block_q, block_k, interpret):
    o, lse = _fwd_call(q, k, v, block_q, block_k, interpret)
    return o, (q, k, v, o, lse)


def _flash_bwd_rule(block_q, block_k, interpret, residuals, do):
    q, k, v, o, lse = residuals
    return _bwd_call(q, k, v, o, lse, do, block_q, block_k, interpret)


_flash.defvjp(_flash_fwd_rule, _flash_bwd_rule)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    block_q: int = 256,
    block_k: int = 256,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Single-head attention over (B, N, C); returns (B, N, C). Differentiable.

    N must be divisible by the block sizes (spatial token counts here are
    powers of two); C should be a multiple of 128 for lane alignment (all
    reference attention widths are: 128/256/512). ``interpret`` defaults to
    True off-TPU so tests exercise the kernels on the CPU interpreter.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, N, C = q.shape
    block_q = min(block_q, N)
    block_k = min(block_k, N)
    assert N % block_q == 0 and N % block_k == 0, (N, block_q, block_k)
    return _flash(q, k, v, block_q, block_k, interpret)

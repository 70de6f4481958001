"""Bandwidth-bound GroupNorm statistics kernels + custom-VJP group norm.

Why this exists: profiling the CIFAR-10 train step (docs/performance.md)
shows XLA's reduce emitter reading pre-norm activations at ~130 GB/s —
about 1/6 of v5e HBM bandwidth — for the per-group mean/E[x^2] passes and
their backward counterparts, costing ~7 ms of a 38 ms step. These kernels
stream each activation tile through VMEM once and accumulate the row sums
on the VPU, and indeed run ~2.3x faster than the XLA reduces at op level
(3.0 vs 6.8 ms/step summed over the UNet). They are OFF by default in
GroupNorm32, though: on the UNet every call site pays a layout-transpose
copy (XLA keeps conv activations batch-minor {0,3,2,1}; custom-call
operands must be default-layout) plus a fusion break, which costs more
than the kernels save (measured net -21% end-to-end; see
docs/performance.md round-2 ledger). Kept as a validated opt-in
(``GroupNorm32(pallas_stats=True)``) for models where the layout tax does
not apply. Kernels:

  * ``row_sums_sq(x)``      -> (sum_n x, sum_n x^2)      per (batch, channel)
  * ``row_sums_cross(x,g)`` -> (sum_n g, sum_n x*g)      per (batch, channel)

``group_norm_affine`` builds a full GroupNorm (the reference's default
normalizer, ddpm_torch/models/unet.py:18-20: 32 groups, eps 1e-6, stats in
f32) from them with a custom VJP:

  forward:  stats kernel + affine apply ``y = x*a + b`` left as jnp so XLA
            fuses it into the consuming convolution (no materialized f32
            normalized tensor);
  backward: one cross-sums kernel (reads x and dy once) + closed-form
            elementwise dx — the standard GN gradient
            ``dx = rs*(g*dy - mean(g*dy) - xhat*mean(g*dy*xhat))`` with the
            per-group means taken from the kernel's channel sums.

Everything degrades gracefully: non-TPU backends, channel counts that are
not lane-aligned, or ragged row counts fall back to the jnp path in
nn/modules.py (numerically identical; stats are f32 sums either way).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["row_sums_sq", "row_sums_cross", "group_norm_affine", "supports"]


def _largest_divisor_leq(n: int, cap: int) -> int:
    best = 1
    for r in range(1, int(math.isqrt(n)) + 1):
        if n % r == 0:
            for d in (r, n // r):
                if d <= cap and d > best:
                    best = d
    return best


def _pick_rows(n: int, c: int, itemsize: int, num_operands: int = 1) -> int:
    """Largest divisor of n whose input blocks stay under ~1 MiB TOTAL.

    ``num_operands`` scales the budget: the cross (backward) kernel loads
    two (rows, C) blocks per grid step (x and dy), so its per-operand cap
    is half the sumsq kernel's.
    """
    cap = max(1, (1 << 20) // max(1, c * itemsize * num_operands))
    return _largest_divisor_leq(n, min(cap, n))


def supports(shape, c_axis_multiple: int = 128, itemsize: int = 4) -> bool:
    """True if the (B, N, C) shape maps well onto the stats kernels.

    ``itemsize`` is the input dtype's byte width; callers that don't pass it
    get the f32 worst case so the predicate never approves a shape whose
    actual kernel launch would degrade to rows=1 blocks. Budgets for the
    two-operand backward kernel (the tighter of the two launches).
    """
    if len(shape) != 3:
        return False
    _, n, c = shape
    if c % c_axis_multiple != 0:
        return False
    # need a sensible row block; prime/awkward N falls back to jnp
    return _pick_rows(n, c, itemsize, num_operands=2) >= min(n, 8)


def _sumsq_kernel(x_ref, s1_ref, s2_ref):
    j = pl.program_id(1)
    xb = x_ref[0].astype(jnp.float32)  # (R, C)
    s1 = jnp.sum(xb, axis=0, keepdims=True)[None]  # (1, 1, C)
    s2 = jnp.sum(xb * xb, axis=0, keepdims=True)[None]

    @pl.when(j == 0)
    def _():
        s1_ref[...] = s1
        s2_ref[...] = s2

    @pl.when(j > 0)
    def _():
        s1_ref[...] += s1
        s2_ref[...] += s2


def _cross_kernel(x_ref, g_ref, s1_ref, s2_ref):
    j = pl.program_id(1)
    xb = x_ref[0].astype(jnp.float32)
    gb = g_ref[0].astype(jnp.float32)
    s1 = jnp.sum(gb, axis=0, keepdims=True)[None]  # (1, 1, C)
    s2 = jnp.sum(xb * gb, axis=0, keepdims=True)[None]

    @pl.when(j == 0)
    def _():
        s1_ref[...] = s1
        s2_ref[...] = s2

    @pl.when(j > 0)
    def _():
        s1_ref[...] += s1
        s2_ref[...] += s2


def _row_block_call(kernel, args, interpret: bool):
    b, n, c = args[0].shape
    rows = _pick_rows(n, c, args[0].dtype.itemsize, num_operands=len(args))
    grid = (b, n // rows)
    in_spec = pl.BlockSpec((1, rows, c), lambda bi, j: (bi, j, 0), memory_space=pltpu.VMEM)
    # outputs are (B, 1, C) so the trailing block dims equal the array dims
    # (the Mosaic lowering requires (8,128)-divisible or full trailing dims)
    out_spec = pl.BlockSpec((1, 1, c), lambda bi, j: (bi, 0, 0), memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((b, 1, c), jnp.float32)
    s1, s2 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[in_spec] * len(args),
        out_specs=(out_spec, out_spec),
        out_shape=(out_shape, out_shape),
        interpret=interpret,
    )(*args)
    return s1[:, 0, :], s2[:, 0, :]


def row_sums_sq(x: jnp.ndarray, interpret: bool = False):
    """x: (B, N, C) -> (sum over N of x, sum over N of x^2), f32 (B, C)."""
    return _row_block_call(_sumsq_kernel, (x,), interpret)


def row_sums_cross(x: jnp.ndarray, g: jnp.ndarray, interpret: bool = False):
    """x, g: (B, N, C) -> (sum over N of g, sum over N of x*g), f32 (B, C)."""
    return _row_block_call(_cross_kernel, (x, g), interpret)


def _rep(v: jnp.ndarray, cg: int) -> jnp.ndarray:
    """(B, G) -> (B, G*cg) channel-broadcast of per-group values."""
    return jnp.repeat(v, cg, axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def group_norm_affine(x, scale, bias, num_groups, eps, out_dtype, interpret=False):
    """GroupNorm over (B, N, C) with per-channel affine, output in out_dtype.

    Matches nn.GroupNorm numerics (f32 statistics, E[x^2]-mu^2 variance
    clamped at 0, eps inside the rsqrt) while keeping the apply as fusible
    elementwise jnp and the statistics in a bandwidth-bound Pallas kernel.
    """
    y, _ = _gn_fwd(x, scale, bias, num_groups, eps, out_dtype, interpret)
    return y


def _gn_fwd(x, scale, bias, num_groups, eps, out_dtype, interpret):
    b, n, c = x.shape
    g, cg = num_groups, c // num_groups
    cnt = n * cg
    s1, s2 = row_sums_sq(x, interpret=interpret)  # f32 (B, C)
    gs1 = s1.reshape(b, g, cg).sum(-1)
    gs2 = s2.reshape(b, g, cg).sum(-1)
    mu = gs1 / cnt  # (B, G)
    var = jnp.maximum(gs2 / cnt - mu * mu, 0.0)
    rs = jax.lax.rsqrt(var + eps)  # (B, G)
    a_c = _rep(rs, cg) * scale[None, :]  # (B, C)
    b_c = bias[None, :] - _rep(mu, cg) * a_c
    y = (x.astype(jnp.float32) * a_c[:, None, :] + b_c[:, None, :]).astype(out_dtype)
    return y, (x, scale, mu, rs)


def _gn_fwd_vjp(x, scale, bias, num_groups, eps, out_dtype, interpret):
    y, res = _gn_fwd(x, scale, bias, num_groups, eps, out_dtype, interpret)
    return y, res


def _gn_bwd(num_groups, eps, out_dtype, interpret, res, dy):
    x, scale, mu, rs = res
    b, n, c = x.shape
    g, cg = num_groups, c // num_groups
    cnt = n * cg
    sg, sxg = row_sums_cross(x, dy, interpret=interpret)  # f32 (B, C)
    mu_c = _rep(mu, cg)
    rs_c = _rep(rs, cg)
    # per-channel sum over N of dy*xhat, xhat = (x - mu) * rs
    sdyxhat_c = rs_c * (sxg - mu_c * sg)
    dscale = sdyxhat_c.sum(0)  # (C,)
    dbias = sg.sum(0)
    t1 = (scale[None, :] * sg).reshape(b, g, cg).sum(-1)  # (B, G): sum g*dy
    t2 = (scale[None, :] * sdyxhat_c).reshape(b, g, cg).sum(-1)  # sum g*dy*xhat
    # dx = rs*(scale*dy - t1/cnt - xhat * t2/cnt)
    #    = A1*dy + B1*x + A0 with per-(B,C) coefficients
    a1 = rs_c * scale[None, :]
    b1 = _rep(-(rs * rs) * t2 / cnt, cg)
    a0 = _rep(-rs * t1 / cnt, cg) - mu_c * b1
    dx = (
        a1[:, None, :] * dy.astype(jnp.float32)
        + b1[:, None, :] * x.astype(jnp.float32)
        + a0[:, None, :]
    ).astype(x.dtype)
    return dx, dscale, dbias


group_norm_affine.defvjp(_gn_fwd_vjp, _gn_bwd)

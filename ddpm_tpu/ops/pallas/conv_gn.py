"""Implicit-GEMM 3x3 SAME conv with a fused GroupNorm-statistics epilogue.

The last known perf gap in the CIFAR-10 train step is the GN statistics
pass: ~6.8 ms of a 37.8 ms step spent re-reading every pre-norm activation
to reduce E[x], E[x^2] (docs/performance.md). Three replacement routes
(two-stage jnp reduce, standalone Pallas stats kernels, MXU skinny-stats)
were measured and all lost to XLA's global layout/fusion choices; the only
remaining route is to never re-read the activation at all — emit the sums
from the *producing* convolution's epilogue while the output tile is still
in VMEM. That is this kernel:

  y, s1, s2 = conv3x3_gn_stats(x, w, b)
    y  = SAME conv(x, w) + b                        (NHWC, 3x3, stride 1)
    s1 = sum over (H, W) of y    per (batch, channel)   [f32]
    s2 = sum over (H, W) of y^2  per (batch, channel)   [f32]

The group collapse (C -> num_groups) is left to XLA — it is a [B, C]-sized
reduction, three orders of magnitude smaller than the [B, H, W, C] pass
this kernel absorbs — and the GroupNorm that consumes (s1, s2) becomes a
pure elementwise affine.

Kernel design (one grid step per batch block of ``block_b`` images):
  * implicit GEMM: the 3x3 conv is 9 MXU matmuls [Bb*H*W, Cin] x
    [Cin, Cout], one per tap, accumulated in f32; the tap operand is a
    static slice of the zero-padded input block, so no im2col buffer is
    ever materialized.
  * the f32 accumulator is reduced to (s1, s2) in-register before being
    rounded once to the output dtype — the stats read costs nothing.
  * weights ride along as a [9, Cin, Cout] block shared by every grid step.

Backward is a custom VJP in plain XLA ops: the cotangent of (y, s1, s2)
folds into one effective dy (``dy + ds1 + 2*y*ds2``), after which dx/dw/db
are the standard bilinear conv transposes — no primal recompute.

Measured verdict for the CIFAR UNet lives in docs/performance.md (round 3);
`supports()` gates the shapes the kernel is validated for.

Reference semantics being fused: ddpm_torch/models/unet.py:18-20 (GroupNorm
over a conv output) + the 3x3 SAME convs of models/unet.py:63-89.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["conv3x3_gn_stats", "conv3x3_gn_stats_reference", "supports"]

# Test hook: force the Pallas kernel through the interpreter on non-TPU
# backends so model-level tests can exercise the fused path on CPU.
FORCE_INTERPRET = False


def supports(x_shape, w_shape, block_b: int = 4, itemsize: int = 4) -> bool:
    """True when (x, w) map onto the validated kernel configuration.

    ``itemsize`` is the byte width of x/w/y elements (2 for bf16, 4 for f32);
    the default budgets for f32 — pass the real dtype's itemsize so bf16
    models get the larger admissible shape set."""
    if len(x_shape) != 4 or len(w_shape) != 4:
        return False
    b, h, w, cin = x_shape
    kh, kw, wcin, cout = w_shape
    if (kh, kw) != (3, 3) or wcin != cin:
        return False
    if cin % 128 != 0 or cout % 128 != 0:
        return False
    if b % block_b != 0:
        return False
    # VMEM budget: padded input block + f32 accumulator + in/out blocks
    # (double-buffered). Keep the static footprint under ~8 MiB.
    rows = block_b * h * w
    vmem = (
        block_b * (h + 2) * (w + 2) * cin * itemsize  # padded block
        + rows * cout * 4  # f32 accumulator
        + 2 * (block_b * h * w * (cin + cout)) * itemsize  # double-buffered x/y
        + 9 * cin * cout * itemsize
    )
    return vmem <= 8 * 1024 * 1024


def _conv_stats_kernel(x_ref, w_ref, b_ref, y_ref, s1_ref, s2_ref, *, h, w):
    bb = x_ref.shape[0]
    cin = x_ref.shape[-1]
    cout = w_ref.shape[-1]
    # zero-pad the spatial dims once per block; every tap is then a static
    # in-register slice (SAME padding, reference SamePad2d semantics)
    xp = jnp.pad(x_ref[:], ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((bb * h * w, cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            xs = xp[:, dy : dy + h, dx : dx + w, :].reshape(bb * h * w, cin)
            acc = acc + jnp.dot(
                xs, w_ref[dy * 3 + dx], preferred_element_type=jnp.float32
            )
    acc = acc + b_ref[0][None, :].astype(jnp.float32)
    y_ref[:] = acc.reshape(bb, h, w, cout).astype(y_ref.dtype)
    per_image = acc.reshape(bb, h * w, cout)
    # stats blocks are [1, bb, C] (3-D so the trailing dims match the full
    # array — TPU tiling requires sublane%8 or full-dim blocks)
    s1_ref[0] = jnp.sum(per_image, axis=1)
    s2_ref[0] = jnp.sum(per_image * per_image, axis=1)


def _conv_only(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def conv3x3_gn_stats_reference(x, w, b):
    """jnp reference / fallback: identical math, no fusion."""
    y32 = _conv_only(x.astype(jnp.float32), w.astype(jnp.float32))
    y32 = y32 + b.astype(jnp.float32)[None, None, None, :]
    s1 = jnp.sum(y32, axis=(1, 2))
    s2 = jnp.sum(y32 * y32, axis=(1, 2))
    return y32.astype(x.dtype), s1, s2


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def conv3x3_gn_stats(x, w, b, block_b: int = 4, interpret: bool = False):
    """SAME 3x3 conv + bias with per-(batch, channel) sum / sum-of-squares
    of the output computed in the conv's epilogue (one HBM write, zero
    re-reads). x: [B,H,W,Cin]; w: [3,3,Cin,Cout] (HWIO); b: [Cout].

    Returns (y [B,H,W,Cout] in x.dtype, s1 [B,Cout] f32, s2 [B,Cout] f32).
    """
    return _forward(x, w, b, block_b, interpret)


def _forward(x, w, b, block_b, interpret):
    bsz, h, wd, cin = x.shape
    cout = w.shape[-1]
    on_tpu = jax.default_backend() == "tpu" or interpret
    if not (on_tpu and supports(x.shape, w.shape, block_b, x.dtype.itemsize)):
        return conv3x3_gn_stats_reference(x, w, b)
    w9 = w.reshape(9, cin, cout)
    grid = (bsz // block_b,)
    y, s1, s2 = pl.pallas_call(
        functools.partial(_conv_stats_kernel, h=h, w=wd),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (block_b, h, wd, cin), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((9, cin, cout), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (block_b, h, wd, cout), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, block_b, cout), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, block_b, cout), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, h, wd, cout), x.dtype),
            jax.ShapeDtypeStruct((bsz // block_b, block_b, cout), jnp.float32),
            jax.ShapeDtypeStruct((bsz // block_b, block_b, cout), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(x, w9, b.reshape(1, cout))
    return y, s1.reshape(bsz, cout), s2.reshape(bsz, cout)


def _fwd(x, w, b, block_b, interpret):
    y, s1, s2 = _forward(x, w, b, block_b, interpret)
    return (y, s1, s2), (x, w, y)


def _bwd(block_b, interpret, res, cots):
    x, w, y = res
    dy, ds1, ds2 = cots
    # fold the stats cotangents into one effective dy:
    #   s1 = sum_hw y, s2 = sum_hw y^2  =>  dL/dy += ds1 + 2 y ds2
    dy_eff = (
        dy.astype(jnp.float32)
        + ds1[:, None, None, :]
        + 2.0 * y.astype(jnp.float32) * ds2[:, None, None, :]
    )
    dy_eff = dy_eff.astype(x.dtype)
    # bilinear conv: vjp needs only (x, w), never the primal output
    _, lin_vjp = jax.vjp(_conv_only, x, w)
    dx, dw = lin_vjp(dy_eff)
    db = jnp.sum(dy_eff.astype(jnp.float32), axis=(0, 1, 2)).astype(x.dtype)
    return dx, dw, db


conv3x3_gn_stats.defvjp(_fwd, _bwd)


def gn_from_stats(y, s1, s2, scale, bias, num_groups=32, eps=1e-6, shift=None):
    """GroupNorm of ``y`` using the conv epilogue's (s1, s2) — no stats read.

    ``shift`` is an optional per-(batch, channel) constant added to y before
    normalizing (the ResidualBlock's broadcast timestep embedding,
    models/unet.py ``h + emb[:, None, None, :]``). Because it is constant
    over space, its effect on the group statistics is closed-form:
        sum_hw (y + e) = s1 + N_hw * e
        sum_hw (y + e)^2 = s2 + 2 e s1 + N_hw e^2
    so the embedding add fuses into the same elementwise pass instead of
    forcing a fresh stats reduction.

    The affine form matches GroupNorm32 (nn/modules.py): per-group
    a = rsigma * scale, b = bias - mu * a, y_out = (y + shift) * a + b,
    statistics in f32, output in y.dtype.
    """
    bsz, h, w, c = y.shape
    n_hw = h * w
    cpg = c // num_groups
    n = n_hw * cpg
    s1 = s1.astype(jnp.float32)
    s2 = s2.astype(jnp.float32)
    if shift is not None:
        e = shift.astype(jnp.float32)
        s2 = s2 + 2.0 * e * s1 + n_hw * e * e
        s1 = s1 + n_hw * e
    gs1 = s1.reshape(bsz, num_groups, cpg).sum(-1)
    gs2 = s2.reshape(bsz, num_groups, cpg).sum(-1)
    mu = gs1 / n
    var = gs2 / n - mu * mu
    rsigma = jax.lax.rsqrt(var + eps)
    a = jnp.repeat(rsigma, cpg, axis=1) * scale.astype(jnp.float32)[None, :]
    b = bias.astype(jnp.float32)[None, :] - jnp.repeat(mu, cpg, axis=1) * a
    yf = y.astype(jnp.float32)
    if shift is not None:
        yf = yf + shift.astype(jnp.float32)[:, None, None, :]
    out = yf * a[:, None, None, :] + b[:, None, None, :]
    return out.astype(y.dtype)

"""Whole-level fusion: ResidualBlock -> AttentionBlock as ONE Pallas program.

The round-2/3 performance ledger (docs/performance.md) chased the GN-stats
HBM bucket through four measured attacks; every one lost to the same
structural tax — a custom call per op boundary forces XLA's batch-minor conv
layout into default layout at EVERY call site. Its own post-mortem names the
single untried route: "own an entire UNet level as one kernel", paying the
layout boundary once at entry and once at exit while every intermediate
tensor of the level lives and dies in VMEM.

This kernel is that experiment, scoped to the model family's 16x16
attention level (N = 256 tokens, C a multiple of 128): the eval-mode
forward of

    r = ResidualBlock(x, t_emb)      # GN1+SiLU -> conv1 -> +emb -> GN2+SiLU -> conv2 -> +x
    y = AttentionBlock(r)            # GN3 -> qkv -> softmax(QK^T/sqrt(C))V -> proj -> +r

(reference semantics: ddpm_torch/models/unet.py:23-89; flax twins:
models/unet.py ResidualBlock/AttentionBlock) with NO HBM traffic between
the eleven fused ops: one x read, one y write, plus the parameter block.
Eval-mode (no dropout) makes it a sampling-path kernel; training would need
a custom VJP over the whole level (not built — see the measured verdict in
docs/performance.md before investing there).

Design notes:
  * grid over batch blocks; per block the three GroupNorms compute their
    per-image/group statistics from VMEM-resident f32 values — the stats
    "second read" that costs ~6.8 ms/step in the XLA graph never touches HBM.
  * both 3x3 SAME convs are 9-tap implicit GEMMs (same scheme as
    conv_gn.py): MXU matmuls over static slices of a zero-padded block.
  * the timestep conditioning arrives pre-projected as ``emb`` [B, C]
    (fc(silu(t_emb)) stays in XLA: a [B,512]x[512,C] matmul is noise, and
    keeping it outside makes the kernel signature model-agnostic).
  * attention is a static per-image loop: N<=256 tokens means the [N,N]
    f32 score matrix is a few vregs; softmax in f32, matmuls on the MXU.
  * group collapse / group->channel broadcast are matmuls against a
    constant [C, G] indicator — Mosaic's vector-layout pass rejects the
    lane-splitting reshape [C] -> [G, cpg] they replace.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["res_attn_fused", "res_attn_reference", "supports", "params_from_module"]

# Test hook: force interpreter mode on non-TPU backends (mirrors conv_gn.py).
FORCE_INTERPRET = False

NUM_GROUPS = 32
EPS = 1e-6


def supports(x_shape, block_b: int = 4, itemsize: int = 2) -> bool:
    """Validated envelope: 16x16 spatial (N = 256 tokens) ONLY, C % 128 ==
    0, cpg >= 8, batch divisible by the block. Measured on chip (round 4):
    at 16x16x256 the kernel matches XLA op-level and wins 1.18x end to end
    in the celeba-arch DDIM sampler; at 8x8x256 it LOSES ~5% op-level
    (blocks too small for MXU efficiency) and fusing the 8x8 middle pair
    lowered the end-to-end win to 1.15x — so smaller levels are excluded."""
    if len(x_shape) != 4:
        return False
    b, h, w, c = x_shape
    if h != w or h * w != 256 or c % 128 != 0 or c // NUM_GROUPS < 8:
        return False
    if b % block_b != 0:
        return False
    n = h * w
    vmem = (
        2 * block_b * n * c * itemsize          # in/out blocks (double-buffered)
        + block_b * (h + 2) * (w + 2) * c * itemsize  # padded conv operand
        + 3 * block_b * n * c * 4               # f32 acc + residual + attn in
        + (2 * 9 + 4) * c * c * itemsize        # conv1/conv2 + qkv + proj weights
        + n * n * 4                              # score matrix (one image)
    )
    return vmem <= 12 * 1024 * 1024


def _group_matrix(c):
    """[C, G] 0/1 indicator (channel c in group c // cpg). Group collapse and
    group->channel broadcast become matmuls — Mosaic's vector-layout pass
    rejects the lane-splitting reshape [C] -> [G, cpg] this replaces."""
    cpg = c // NUM_GROUPS
    cidx = jax.lax.broadcasted_iota(jnp.int32, (c, NUM_GROUPS), 0)
    gidx = jax.lax.broadcasted_iota(jnp.int32, (c, NUM_GROUPS), 1)
    return (cidx // cpg == gidx).astype(jnp.float32)


def _gn_affine(stats_src_f32, scale_ref, bias_ref, n_tokens):
    """Per-image GroupNorm affine from a VMEM-resident f32 [bb, N, C] value.

    Returns (a, b): per-(image, channel) f32 multiplier/offset such that
    y = x * a + b equals GroupNorm32's affine-rearranged form
    (nn/modules.py: a = rsigma*scale, b = bias - mu*a, f32 stats).
    """
    bb, _, c = stats_src_f32.shape
    cpg = c // NUM_GROUPS
    m = _group_matrix(c)                                     # [C, G]
    s1 = jnp.sum(stats_src_f32, axis=1)                     # [bb, C]
    s2 = jnp.sum(stats_src_f32 * stats_src_f32, axis=1)     # [bb, C]
    gs1 = jnp.dot(s1, m, preferred_element_type=jnp.float32)  # [bb, G]
    gs2 = jnp.dot(s2, m, preferred_element_type=jnp.float32)
    n = n_tokens * cpg
    mu = gs1 / n
    var = gs2 / n - mu * mu
    rsigma = jax.lax.rsqrt(var + EPS)
    rs_c = jnp.dot(rsigma, m.T, preferred_element_type=jnp.float32)  # [bb, C]
    mu_c = jnp.dot(mu, m.T, preferred_element_type=jnp.float32)
    a = rs_c * scale_ref[0].astype(jnp.float32)[None, :]
    b = bias_ref[0].astype(jnp.float32)[None, :] - mu_c * a
    return a, b


def _silu(x):
    return x * jax.nn.sigmoid(x)


def _conv3x3(x_tokens_f32_to_dtype, w9_ref, b_ref, bb, h, w, c_in, dtype):
    """9-tap implicit-GEMM SAME conv of a [bb, h, w, c_in] block (conv_gn.py
    scheme). Input arrives as the compute-dtype spatial block; returns the
    f32 accumulator [bb, h*w, c_out]."""
    cout = w9_ref.shape[-1]
    xp = jnp.pad(x_tokens_f32_to_dtype, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((bb * h * w, cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            xs = xp[:, dy : dy + h, dx : dx + w, :].reshape(bb * h * w, c_in)
            acc = acc + jnp.dot(
                xs, w9_ref[dy * 3 + dx], preferred_element_type=jnp.float32
            )
    acc = acc + b_ref[0][None, :].astype(jnp.float32)
    return acc.reshape(bb, h * w, cout)


def _level_kernel(
    x_ref, emb_ref,
    gn1s_ref, gn1b_ref, c1w_ref, c1b_ref,
    gn2s_ref, gn2b_ref, c2w_ref, c2b_ref,
    gn3s_ref, gn3b_ref, qkvw_ref, qkvb_ref, pw_ref, pb_ref,
    y_ref, *, h, w,
):
    bb = x_ref.shape[0]
    c = x_ref.shape[-1]
    n = h * w
    dtype = x_ref.dtype
    emb = emb_ref[0]                                         # [bb, C] (3-D block:
    # TPU blocks need sublane%8 or full-dim — same trick as conv_gn's stats)
    x = x_ref[:]                                             # [bb, h, w, C]
    xf = x.reshape(bb, n, c).astype(jnp.float32)

    # --- ResidualBlock ---
    a1, b1 = _gn_affine(xf, gn1s_ref, gn1b_ref, n)
    h1 = _silu(xf * a1[:, None, :] + b1[:, None, :]).astype(dtype)
    acc1 = _conv3x3(h1.reshape(bb, h, w, c), c1w_ref, c1b_ref, bb, h, w, c, dtype)
    acc1 = acc1 + emb.astype(jnp.float32)[:, None, :]
    # GN2's statistics come from the f32 accumulator already in-register.
    # The XLA graph computes them from the bf16-rounded conv output; round
    # first so the fused path is bit-compatible with the unfused model.
    acc1 = acc1.astype(dtype).astype(jnp.float32)
    a2, b2 = _gn_affine(acc1, gn2s_ref, gn2b_ref, n)
    h2 = _silu(acc1 * a2[:, None, :] + b2[:, None, :]).astype(dtype)
    acc2 = _conv3x3(h2.reshape(bb, h, w, c), c2w_ref, c2b_ref, bb, h, w, c, dtype)
    r = (xf + acc2.astype(dtype).astype(jnp.float32))        # residual, f32 [bb,N,C]
    r = r.astype(dtype).astype(jnp.float32)

    # --- AttentionBlock ---
    a3, b3 = _gn_affine(r, gn3s_ref, gn3b_ref, n)
    att_in = (r * a3[:, None, :] + b3[:, None, :]).astype(dtype)  # [bb, N, C]
    scale = 1.0 / jnp.sqrt(jnp.asarray(c, jnp.float32))
    outs = []
    for i in range(bb):
        qkv = (
            jnp.dot(att_in[i], qkvw_ref[:], preferred_element_type=jnp.float32)
            + qkvb_ref[0][None, :].astype(jnp.float32)
        ).astype(dtype)                                       # [N, 3C]
        q, k, v = qkv[:, :c], qkv[:, c : 2 * c], qkv[:, 2 * c :]
        logits = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
        weights = jnp.exp(logits - jnp.max(logits, axis=-1, keepdims=True))
        weights = weights / jnp.sum(weights, axis=-1, keepdims=True)
        o = jnp.dot(
            weights.astype(dtype), v, preferred_element_type=jnp.float32
        ).astype(dtype)
        o = (
            jnp.dot(o, pw_ref[:], preferred_element_type=jnp.float32)
            + pb_ref[0][None, :].astype(jnp.float32)
        )
        outs.append(o)
    att = jnp.stack(outs, axis=0)                             # [bb, N, C] f32
    y = (r + att).astype(dtype)
    y_ref[:] = y.reshape(bb, h, w, c)


def res_attn_fused(x, emb, p, block_b: int = 4, interpret: bool = False):
    """Fused eval-mode forward of AttentionBlock(ResidualBlock(x, t_emb)).

    x: [B, H, W, C] (compute dtype); emb: [B, C] pre-projected conditioning
    (fc(silu(t_emb)) computed outside); p: dict of parameters in f32 —
    gn{1,2,3}_{scale,bias} [C], conv{1,2}_{w [3,3,C,C], b [C]},
    qkv_{w [C,3C], b [3C]}, proj_{w [C,C], b [C]} (Dense kernels, i.e. the
    flax AttentionBlock's project_in/project_out).
    """
    on_tpu = jax.default_backend() == "tpu" or interpret
    if not (on_tpu and supports(x.shape, block_b, x.dtype.itemsize)):
        return res_attn_reference(x, emb, p)
    bsz, h, w, c = x.shape
    dt = x.dtype
    vec = lambda a: a.reshape(1, -1)  # noqa: E731  (1, K) VMEM rows
    args = (
        x, emb.astype(dt).reshape(bsz // block_b, block_b, c),
        vec(p["gn1_scale"]), vec(p["gn1_bias"]),
        p["conv1_w"].reshape(9, c, c).astype(dt), vec(p["conv1_b"]),
        vec(p["gn2_scale"]), vec(p["gn2_bias"]),
        p["conv2_w"].reshape(9, c, c).astype(dt), vec(p["conv2_b"]),
        vec(p["gn3_scale"]), vec(p["gn3_bias"]),
        p["qkv_w"].astype(dt), vec(p["qkv_b"]),
        p["proj_w"].astype(dt), vec(p["proj_b"]),
    )
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim, memory_space=pltpu.VMEM)  # noqa: E731
    in_specs = [
        pl.BlockSpec((block_b, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_b, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    ] + [full(a) for a in args[2:]]
    y = pl.pallas_call(
        functools.partial(_level_kernel, h=h, w=w),
        grid=(bsz // block_b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (block_b, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, h, w, c), dt),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
        interpret=interpret,
    )(*args)
    return y


def _gn_ref(x, scale, bias):
    b, h, w, c = x.shape
    cpg = c // NUM_GROUPS
    xf = x.astype(jnp.float32).reshape(b, h * w, NUM_GROUPS, cpg)
    mu = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.mean(xf * xf, axis=(1, 3), keepdims=True) - mu * mu
    a = jax.lax.rsqrt(var + EPS)
    y = (xf - mu) * a
    y = y.reshape(b, h, w, c) * scale[None, None, None, :] + bias[None, None, None, :]
    return y.astype(x.dtype)


def res_attn_reference(x, emb, p):
    """Plain-XLA twin of the fused kernel (identical math, op-by-op) — the
    numerical oracle for tests and the measured A/B baseline."""
    dt = x.dtype
    conv = lambda h, w_, b_: (  # noqa: E731
        jax.lax.conv_general_dilated(
            h, w_.astype(dt), (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        + b_.astype(jnp.float32)[None, None, None, :]
    )
    h1 = jax.nn.silu(_gn_ref(x, p["gn1_scale"], p["gn1_bias"]).astype(jnp.float32)).astype(dt)
    h = conv(h1, p["conv1_w"], p["conv1_b"])
    h = (h + emb.astype(jnp.float32)[:, None, None, :]).astype(dt)
    h2 = jax.nn.silu(_gn_ref(h, p["gn2_scale"], p["gn2_bias"]).astype(jnp.float32)).astype(dt)
    h = conv(h2, p["conv2_w"], p["conv2_b"]).astype(dt)
    r = x + h
    a = _gn_ref(r, p["gn3_scale"], p["gn3_bias"])
    b, hh, ww, c = a.shape
    af = a.reshape(b, hh * ww, c)
    qkv = (
        jnp.einsum("bnc,cd->bnd", af, p["qkv_w"].astype(dt), preferred_element_type=jnp.float32)
        + p["qkv_b"].astype(jnp.float32)[None, None, :]
    ).astype(dt)
    q, k, v = qkv[..., :c], qkv[..., c : 2 * c], qkv[..., 2 * c :]
    logits = jnp.einsum("bnc,bmc->bnm", q, k, preferred_element_type=jnp.float32)
    logits = logits / jnp.sqrt(jnp.asarray(c, jnp.float32))
    wts = jnp.exp(logits - jnp.max(logits, axis=-1, keepdims=True))
    wts = wts / jnp.sum(wts, axis=-1, keepdims=True)
    o = jnp.einsum(
        "bnm,bmc->bnc", wts.astype(dt), v, preferred_element_type=jnp.float32
    ).astype(dt)
    o = (
        jnp.einsum("bnc,cd->bnd", o, p["proj_w"].astype(dt), preferred_element_type=jnp.float32)
        + p["proj_b"].astype(jnp.float32)[None, None, :]
    )
    return (r + o.reshape(b, hh, ww, c).astype(dt)).astype(dt)


def params_from_module(res_params, attn_params):
    """Adapt flax param trees (models/unet.py ResidualBlock + AttentionBlock,
    same-channel case) to this kernel's flat dict."""
    return {
        "gn1_scale": res_params["norm1"]["GroupNorm_0"]["scale"],
        "gn1_bias": res_params["norm1"]["GroupNorm_0"]["bias"],
        "conv1_w": res_params["conv1"]["kernel"],
        "conv1_b": res_params["conv1"]["bias"],
        "gn2_scale": res_params["norm2"]["GroupNorm_0"]["scale"],
        "gn2_bias": res_params["norm2"]["GroupNorm_0"]["bias"],
        "conv2_w": res_params["conv2"]["kernel"],
        "conv2_b": res_params["conv2"]["bias"],
        "gn3_scale": attn_params["norm"]["GroupNorm_0"]["scale"],
        "gn3_bias": attn_params["norm"]["GroupNorm_0"]["bias"],
        "qkv_w": attn_params["project_in"]["kernel"],
        "qkv_b": attn_params["project_in"]["bias"],
        "proj_w": attn_params["project_out"]["kernel"],
        "proj_b": attn_params["project_out"]["bias"],
    }

"""DDPM UNet (Ho et al. 2020) in flax.linen, NHWC, TPU-first.

Architectural parity with the reference (ddpm_torch/models/unet.py:92-233):
same level structure (``num_res_blocks`` blocks per down level with optional
attention, stride-2 same-pad conv or avg-pool downsample, Res-Attn-Res middle,
``num_res_blocks + 1`` skip-consuming blocks per up level with nearest x2
upsample), same initializer rules (TF variance-scaling fan_avg/uniform, with
zero-init on every output projection), same GroupNorm(32, eps=1e-6) + SiLU.

TPU-first design choices (deliberately not a translation):
* **NHWC layout** throughout — the native layout for TPU convolutions; the
  channel axis lands on the 128-wide lane dimension of the MXU/VPU.
* **bf16 compute / f32 params**: ``dtype`` controls activation & matmul
  precision; parameters and GroupNorm statistics stay f32.
* Attention is two batched MXU matmuls over flattened H*W tokens
  (ops/attention.py) instead of einsums producing 5-D tensors; optionally a
  Pallas flash-attention kernel for long sequences.
* TF-style asymmetric "SAME" padding comes straight from XLA's conv padding
  rule (identical to the reference's SamePad2d, ddpm_torch/modules.py:126-148),
  so no explicit pad ops are inserted.
"""

from __future__ import annotations

from typing import Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.modules import (
    DEFAULT_INIT,
    GroupNorm32,
    get_timestep_embedding,
    variance_scaling_init,
)
from ..ops.attention import spatial_attention
from ..ops.resample import avg_pool_2x, depth_to_space, space_to_depth, upsample_nearest_2x

__all__ = ["UNet", "ResidualBlock", "AttentionBlock", "ModelWrapper"]

ZERO_INIT = variance_scaling_init(0.0)


class AttentionBlock(nn.Module):
    """Single-head full self-attention over spatial positions.

    Mirrors ddpm_torch/models/unet.py:23-60: GroupNorm -> 1x1 conv to 3C
    (qkv) -> softmax(QK^T / sqrt(C)) V -> zero-init 1x1 output projection,
    plus an identity (or 1x1) skip.
    """

    out_channels: int | None = None
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False
    fuse_gn: bool = False
    gn_pallas_stats: bool = False

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        out_ch = self.out_channels or in_ch
        skip = x
        if in_ch != out_ch:
            skip = nn.Dense(out_ch, kernel_init=DEFAULT_INIT, dtype=self.dtype, name="skip")(x)
        h = GroupNorm32(dtype=self.dtype, fuse=self.fuse_gn,
                        pallas_stats=self.gn_pallas_stats, name="norm")(x)
        qkv = nn.Dense(3 * in_ch, kernel_init=DEFAULT_INIT, dtype=self.dtype, name="project_in")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        h = spatial_attention(q, k, v, use_flash=self.use_flash)
        h = nn.Dense(out_ch, kernel_init=ZERO_INIT, dtype=self.dtype, name="project_out")(h)
        return h + skip


class _ConvParams(nn.Module):
    """Parameter holder matching nn.Conv's tree (``{kernel, bias}``) so the
    fused conv+GN-stats path shares checkpoints with the nn.Conv path."""

    features: int
    kernel_size: int = 3
    kernel_init: nn.initializers.Initializer = DEFAULT_INIT

    @nn.compact
    def __call__(self, in_features: int):
        k = self.param(
            "kernel",
            self.kernel_init,
            (self.kernel_size, self.kernel_size, in_features, self.features),
            jnp.float32,
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return k, b


class _DenseParams(nn.Module):
    """Parameter holder matching nn.Dense's tree (``{kernel, bias}``)."""

    features: int
    kernel_init: nn.initializers.Initializer = DEFAULT_INIT

    @nn.compact
    def __call__(self, in_features: int):
        k = self.param(
            "kernel", self.kernel_init, (in_features, self.features), jnp.float32
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return k, b


class _GN32Params(nn.Module):
    """Parameter holder matching GroupNorm32's tree
    (``GroupNorm_0/{scale, bias}``, nn/modules.py)."""

    features: int

    @nn.compact
    def __call__(self):
        from ..nn.modules import _GNParams

        return _GNParams(self.features, name="GroupNorm_0")()


class _FusedResBlockParams(nn.Module):
    """ResidualBlock's exact param tree (same-channel case: no skip conv),
    declared without running the block — the whole-level fused path
    (ops/pallas/level_fuse.py) consumes the raw parameters instead.
    Checkpoints are interchangeable with the module path by construction."""

    out_channels: int

    @nn.compact
    def __call__(self, in_ch: int, embed_dim: int):
        g1 = _GN32Params(in_ch, name="norm1")()
        fc = _DenseParams(self.out_channels, name="fc")(embed_dim)
        c1 = _ConvParams(self.out_channels, 3, name="conv1")(in_ch)
        g2 = _GN32Params(self.out_channels, name="norm2")()
        c2 = _ConvParams(self.out_channels, 3, kernel_init=ZERO_INIT, name="conv2")(
            self.out_channels
        )
        return g1, fc, c1, g2, c2


class _FusedAttnParams(nn.Module):
    """AttentionBlock's exact param tree (identity-skip case)."""

    channels: int

    @nn.compact
    def __call__(self):
        g = _GN32Params(self.channels, name="norm")()
        qkv = _DenseParams(3 * self.channels, name="project_in")(self.channels)
        proj = _DenseParams(self.channels, kernel_init=ZERO_INIT, name="project_out")(
            self.channels
        )
        return g, qkv, proj


class ResidualBlock(nn.Module):
    """Pre-activation residual block with additive timestep conditioning.

    Mirrors ddpm_torch/models/unet.py:63-89: GN -> SiLU -> 3x3 conv, add
    fc(SiLU(t_emb)) broadcast over space, GN -> SiLU -> dropout -> zero-init
    3x3 conv, 1x1-conv skip on channel change.
    """

    out_channels: int
    drop_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32
    fuse_gn: bool = False
    gn_pallas_stats: bool = False
    # conv1's GroupNorm statistics from the conv's own epilogue: the
    # implicit-GEMM Pallas kernel (ops/pallas/conv_gn.py) emits
    # (y, sum y, sum y^2) in one pass, and norm2 normalizes from those sums
    # with the t-embedding shift folded in algebraically — the pre-norm
    # activation is never re-read. Only the conv1 -> (+emb) -> norm2 pair
    # qualifies (norm1's input adds a full skip tensor, which has no
    # closed-form stats adjustment). Parameter tree is unchanged, so
    # checkpoints are interchangeable with the unfused path.
    fuse_conv_gn: bool = False

    @nn.compact
    def __call__(self, x, t_emb, train: bool = False):
        in_ch = x.shape[-1]
        skip = x
        if in_ch != self.out_channels:
            skip = nn.Conv(
                self.out_channels, (1, 1), kernel_init=DEFAULT_INIT, dtype=self.dtype, name="skip"
            )(x)
        h = GroupNorm32(dtype=self.dtype, with_silu=True, fuse=self.fuse_gn,
                        pallas_stats=self.gn_pallas_stats, name="norm1")(x)
        use_conv_gn = False
        if self.fuse_conv_gn:
            # lazy: pallas/mosaic only load when the opt-in flag is set
            from ..ops.pallas import conv_gn

            w_shape = (3, 3, h.shape[-1], self.out_channels)
            use_conv_gn = (
                jax.default_backend() == "tpu" or conv_gn.FORCE_INTERPRET
            ) and conv_gn.supports(h.shape, w_shape, itemsize=h.dtype.itemsize)
        emb = nn.Dense(
            self.out_channels, kernel_init=DEFAULT_INIT, dtype=self.dtype, name="fc"
        )(nn.silu(t_emb))
        if use_conv_gn:
            kernel, bias = _ConvParams(
                self.out_channels, kernel_size=3, name="conv1"
            )(h.shape[-1])
            h, s1, s2 = conv_gn.conv3x3_gn_stats(
                h, kernel.astype(h.dtype), bias.astype(jnp.float32),
                4, conv_gn.FORCE_INTERPRET,
            )
            h = GroupNorm32(
                dtype=self.dtype, with_silu=True, drop_rate=self.drop_rate,
                name="norm2",
            )(h, deterministic=not train, stats=(s1, s2), shift=emb)
        else:
            h = nn.Conv(
                self.out_channels, (3, 3), padding="SAME",
                kernel_init=DEFAULT_INIT, dtype=self.dtype, name="conv1",
            )(h)
            h = h + emb[:, None, None, :]
            # norm2 folds SiLU + dropout into the same (fused) op — the
            # dropout mask comes from the hardware PRNG on the fused TPU path
            h = GroupNorm32(
                dtype=self.dtype, with_silu=True, drop_rate=self.drop_rate,
                fuse=self.fuse_gn, pallas_stats=self.gn_pallas_stats, name="norm2",
            )(h, deterministic=not train)
        h = nn.Conv(
            self.out_channels, (3, 3), padding="SAME",
            kernel_init=ZERO_INIT, dtype=self.dtype, name="conv2",
        )(h)
        return h + skip


class _Downsample(nn.Module):
    """Stride-2 conv with TF 'SAME' padding, or 2x2 average pool
    (ddpm_torch/models/unet.py:163-170)."""

    with_conv: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.with_conv:
            return nn.Conv(
                x.shape[-1], (3, 3), strides=(2, 2), padding="SAME",
                kernel_init=DEFAULT_INIT, dtype=self.dtype, name="conv",
            )(x)
        return avg_pool_2x(x)


class _Upsample(nn.Module):
    """Nearest x2 upsample, optionally followed by a 3x3 conv
    (ddpm_torch/models/unet.py:199-202)."""

    with_conv: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = upsample_nearest_2x(x)
        if self.with_conv:
            x = nn.Conv(
                x.shape[-1], (3, 3), padding="SAME",
                kernel_init=DEFAULT_INIT, dtype=self.dtype, name="conv",
            )(x)
        return x


class UNet(nn.Module):
    """The DDPM UNet, configured identically to the reference
    (in/hid/out channels, ch_multipliers, num_res_blocks, apply_attn,
    drop_rate, resample_with_conv; ddpm_torch/models/unet.py:96-142).

    ``block_size > 1`` folds the reference's ModelWrapper space-to-depth trick
    (ddpm_torch/utils/train.py:349-367) into the model itself: inputs are
    pixel-unshuffled before the trunk and pixel-shuffled back after, which
    multiplies in/out channels by ``block_size**2``.
    """

    in_channels: int = 3
    hid_channels: int = 128
    out_channels: int = 3
    ch_multipliers: Sequence[int] = (1, 2, 2, 2)
    num_res_blocks: int = 2
    apply_attn: Union[bool, Sequence[bool]] = (False, True, False, False)
    time_embedding_dim: int | None = None
    drop_rate: float = 0.0
    resample_with_conv: bool = True
    block_size: int = 1
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False
    # Route GroupNorm+SiLU(+dropout) through the single-pass Pallas kernel
    # (ops/pallas/group_norm.py). Off by default: the kernel beats XLA's
    # GroupNorm op-level (~1.7x fwd), but as a custom call it breaks XLA's
    # fusion with the surrounding convs, which cancels the win end-to-end on
    # this model (measured equal step time either way on a v5e). Kept as a
    # supported path for A/B checks and for models where the norm is not
    # fusion-adjacent to a conv.
    fuse_gn: bool = False
    # Route only the GroupNorm STATISTICS (fwd sums + bwd cross-sums)
    # through the Pallas kernels in ops/pallas/gn_stats.py, leaving the
    # affine apply as fusible jnp. Off by default: on this UNet each custom
    # call pays a conv-layout transpose copy that outweighs the 2.3x
    # op-level kernel win (measured -21% end-to-end; docs/performance.md).
    # Exposed end-to-end so other shapes/models can A/B it.
    gn_pallas_stats: bool = False
    # Fuse each ResidualBlock's conv1 with norm2's statistics via the
    # implicit-GEMM Pallas conv (ops/pallas/conv_gn.py): the conv epilogue
    # emits (sum y, sum y^2) while the tile is in VMEM, and the t-embedding
    # shift folds into the stats algebraically, so the pre-norm activation
    # is never re-read for E[x], E[x^2]. Measured A/B at the CIFAR level-0
    # shape: forward parity with XLA's conv, 1.24x faster fwd+bwd
    # (scripts/bench_conv_gn.py; end-to-end number in docs/performance.md).
    fuse_conv_gn: bool = False
    # Per-block rematerialization (jax.checkpoint on every residual /
    # attention block): backward recomputes block interiors instead of
    # storing them — the HBM-for-FLOPs trade that fits CelebA-HQ 256^2 at
    # batch 64 in one chip's memory.
    remat: bool = False
    # Whole-level fusion for the sampling path: every same-channel
    # ResidualBlock -> AttentionBlock pair at an attention level (and the
    # mid_res1 -> mid_attn pair) runs as ONE Pallas program
    # (ops/pallas/level_fuse.py) when eval-mode and in the kernel's
    # validated envelope — all intermediates stay in VMEM, the three
    # GroupNorms' statistics never touch HBM, and the custom-call layout
    # boundary is paid once per level instead of once per op. Parameter
    # trees are identical to the module path (checkpoint-interchangeable);
    # training mode always uses the modules (dropout + autodiff).
    fuse_level: bool = False

    def _apply_attn(self, level: int) -> bool:
        if isinstance(self.apply_attn, bool):
            return self.apply_attn
        return self.apply_attn[level]

    @nn.compact
    def __call__(self, x, t, *, train: bool = False):
        # remat: checkpoint each block; `train` (arg index 3, counting the
        # bound module) is a static python bool
        ResBlock = (
            nn.remat(ResidualBlock, static_argnums=(3,)) if self.remat else ResidualBlock
        )
        AttnBlock = nn.remat(AttentionBlock) if self.remat else AttentionBlock
        levels = len(self.ch_multipliers)
        embed_dim = self.time_embedding_dim or 4 * self.hid_channels
        chs = [m * self.hid_channels for m in self.ch_multipliers]
        x = x.astype(self.dtype)
        if self.block_size > 1:
            x = space_to_depth(x, self.block_size)

        # --- timestep embedding: sinusoid -> Dense -> SiLU -> Dense ---
        t_emb = get_timestep_embedding(t, self.hid_channels, dtype=jnp.float32)
        t_emb = nn.Dense(embed_dim, kernel_init=DEFAULT_INIT, dtype=self.dtype, name="embed_fc1")(t_emb)
        t_emb = nn.Dense(embed_dim, kernel_init=DEFAULT_INIT, dtype=self.dtype, name="embed_fc2")(
            nn.silu(t_emb)
        )

        def fused_pair(h, out_ch, res_name, attn_name):
            # declare the modules' exact param trees, then run the whole
            # Res->Attn unit as one Pallas program (kernel falls back to an
            # identical-math XLA path off-envelope/off-TPU)
            from ..ops.pallas import level_fuse

            g1, fc, c1, g2, c2 = _FusedResBlockParams(out_ch, name=res_name)(
                h.shape[-1], t_emb.shape[-1]
            )
            g3, qkv, proj = _FusedAttnParams(out_ch, name=attn_name)()
            fck, fcb = fc
            emb = (
                nn.silu(t_emb) @ fck.astype(self.dtype) + fcb.astype(self.dtype)
            )
            p = {
                "gn1_scale": g1[0], "gn1_bias": g1[1],
                "conv1_w": c1[0], "conv1_b": c1[1],
                "gn2_scale": g2[0], "gn2_bias": g2[1],
                "conv2_w": c2[0], "conv2_b": c2[1],
                "gn3_scale": g3[0], "gn3_bias": g3[1],
                "qkv_w": qkv[0], "qkv_b": qkv[1],
                "proj_w": proj[0], "proj_b": proj[1],
            }
            return level_fuse.res_attn_fused(
                h, emb, p, 4, level_fuse.FORCE_INTERPRET
            )

        def use_fused(h, out_ch):
            if not self.fuse_level or train or h.shape[-1] != out_ch:
                return False
            from ..ops.pallas import level_fuse

            return jax.default_backend() == "tpu" or level_fuse.FORCE_INTERPRET

        def block(h, out_ch, level, name):
            if self._apply_attn(level) and use_fused(h, out_ch):
                return fused_pair(h, out_ch, f"{name}_res", f"{name}_attn")
            h = ResBlock(
                out_ch, drop_rate=self.drop_rate, dtype=self.dtype,
                fuse_gn=self.fuse_gn, gn_pallas_stats=self.gn_pallas_stats,
                fuse_conv_gn=self.fuse_conv_gn, name=f"{name}_res"
            )(h, t_emb, train)
            if self._apply_attn(level):
                h = AttnBlock(
                    dtype=self.dtype, use_flash=self.use_flash,
                    fuse_gn=self.fuse_gn, gn_pallas_stats=self.gn_pallas_stats,
                    name=f"{name}_attn",
                )(h)
            return h

        # --- down path ---
        h = nn.Conv(
            self.hid_channels, (3, 3), padding="SAME",
            kernel_init=DEFAULT_INIT, dtype=self.dtype, name="in_conv",
        )(x)
        hs = [h]
        for i in range(levels):
            for j in range(self.num_res_blocks):
                h = block(hs[-1], chs[i], i, f"down_{i}_{j}")
                hs.append(h)
            if i != levels - 1:
                h = _Downsample(self.resample_with_conv, dtype=self.dtype, name=f"downsample_{i}")(
                    hs[-1]
                )
                hs.append(h)

        # --- middle ---
        if use_fused(hs[-1], chs[-1]):
            h = fused_pair(hs[-1], chs[-1], "mid_res1", "mid_attn")
        else:
            h = ResBlock(
                chs[-1], drop_rate=self.drop_rate, dtype=self.dtype,
                fuse_gn=self.fuse_gn, gn_pallas_stats=self.gn_pallas_stats,
                fuse_conv_gn=self.fuse_conv_gn, name="mid_res1",
            )(hs[-1], t_emb, train)
            h = AttnBlock(
                dtype=self.dtype, use_flash=self.use_flash, fuse_gn=self.fuse_gn,
                gn_pallas_stats=self.gn_pallas_stats, name="mid_attn"
            )(h)
        h = ResBlock(
            chs[-1], drop_rate=self.drop_rate, dtype=self.dtype,
            fuse_gn=self.fuse_gn, gn_pallas_stats=self.gn_pallas_stats,
            fuse_conv_gn=self.fuse_conv_gn, name="mid_res2",
        )(h, t_emb, train)

        # --- up path ---
        for i in range(levels - 1, -1, -1):
            for j in range(self.num_res_blocks + 1):
                h = jnp.concatenate([h, hs.pop()], axis=-1)
                h = block(h, chs[i], i, f"up_{i}_{j}")
            if i != 0:
                h = _Upsample(self.resample_with_conv, dtype=self.dtype, name=f"upsample_{i}")(h)
        assert not hs

        # --- output ---
        h = GroupNorm32(dtype=self.dtype, with_silu=True, fuse=self.fuse_gn,
                        pallas_stats=self.gn_pallas_stats, name="out_norm")(h)
        h = nn.Conv(
            self.out_channels * self.block_size**2, (3, 3), padding="SAME",
            kernel_init=ZERO_INIT, dtype=self.dtype, name="out_conv",
        )(h)
        if self.block_size > 1:
            h = depth_to_space(h, self.block_size)
        return h.astype(jnp.float32)


def ModelWrapper(apply_fn, block_size: int):
    """Pre/post pixel-shuffle wrapper around an arbitrary denoise apply.

    API-parity shim for the reference's ModelWrapper
    (ddpm_torch/utils/train.py:349-367), which wraps any model with
    PixelUnshuffle/PixelShuffle. The native path here folds the trick into
    the UNet itself (``UNet(block_size=...)``) so the space-to-depth ops
    fuse into the jitted program; use this wrapper only to adapt an
    external model that doesn't take ``block_size``.
    """
    if block_size <= 1:
        return apply_fn

    def wrapped(variables, x, t, **kwargs):
        y = apply_fn(variables, space_to_depth(x, block_size), t, **kwargs)
        return depth_to_space(y, block_size)

    return wrapped


def build_unet(
    model_cfg,
    channels: int,
    *,
    out_channels: int | None = None,
    dtype=jnp.float32,
    block_size: int = 1,
    remat: bool = False,
    fuse_gn: bool = False,
    use_flash: bool = False,
    gn_pallas_stats: bool = False,
    fuse_conv_gn: bool = False,
    fuse_level: bool = False,
) -> UNet:
    """Build a UNet from a config 'model' section plus dataset channel count.

    Mirrors the reference's ``UNet(**config["model"])`` (train.py:64-68) with
    CLI fallbacks for datasets that run configless; shared by train.py and
    generate.py so the two can never drift. ``out_channels`` overrides both
    config and the channel default — the caller passes ``2 * channels`` under
    ``model_var_type="learned"`` so the head emits (mean-param, logvar-frac)
    channel pairs (reference train.py:63 computes this and overwrites the
    config value the same way).
    """
    model_cfg = model_cfg or {}
    apply_attn = model_cfg.get("apply_attn", (False, True, False, False))
    if isinstance(apply_attn, list):
        apply_attn = tuple(apply_attn)
    if out_channels is None:
        out_channels = model_cfg.get("out_channels", channels)
    return UNet(
        in_channels=model_cfg.get("in_channels", channels),
        hid_channels=model_cfg.get("hid_channels", 128),
        out_channels=out_channels,
        ch_multipliers=tuple(model_cfg.get("ch_multipliers", (1, 2, 2, 2))),
        num_res_blocks=model_cfg.get("num_res_blocks", 2),
        apply_attn=apply_attn,
        drop_rate=model_cfg.get("drop_rate", 0.0),
        block_size=model_cfg.get("block_size", block_size) or 1,
        dtype=dtype,
        remat=bool(model_cfg.get("remat", remat)),
        fuse_gn=bool(model_cfg.get("fuse_gn", fuse_gn)),
        use_flash=bool(model_cfg.get("use_flash", use_flash)),
        gn_pallas_stats=bool(model_cfg.get("gn_pallas_stats", gn_pallas_stats)),
        fuse_conv_gn=bool(model_cfg.get("fuse_conv_gn", fuse_conv_gn)),
        fuse_level=bool(model_cfg.get("fuse_level", fuse_level)),
    )

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


# ---------------------------------------------------------------------- #
# fused GroupNorm+SiLU
# ---------------------------------------------------------------------- #

import flax.linen as nn  # noqa: E402

from ddpm_tpu.ops.pallas.group_norm import (  # noqa: E402
    fused_group_norm_silu,
    group_norm_silu_reference,
)


def _flax_gn_silu(x, gamma, beta, num_groups=32, eps=1e-6, silu=True):
    B, N, C = x.shape
    mod = nn.GroupNorm(num_groups=num_groups, epsilon=eps, dtype=jnp.float32)
    y = mod.apply({"params": {"scale": gamma, "bias": beta}}, x.reshape(B, 1, N, C))
    y = y.reshape(B, N, C)
    return nn.silu(y) if silu else y


def test_fused_gn_silu_matches_flax():
    key = jax.random.key(2)
    B, N, C = 3, 64, 128
    x = jax.random.normal(key, (B, N, C), jnp.float32)
    gamma = jax.random.normal(jax.random.fold_in(key, 1), (C,)) * 0.2 + 1.0
    beta = jax.random.normal(jax.random.fold_in(key, 2), (C,)) * 0.1
    want = _flax_gn_silu(x, gamma, beta)
    got = fused_group_norm_silu(x, gamma, beta, 32, 1e-6, True, True)  # interpret
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
    fallback = group_norm_silu_reference(x, gamma, beta)
    np.testing.assert_allclose(np.asarray(fallback), np.asarray(want), atol=1e-5)


def test_fused_gn_no_silu_matches_flax():
    key = jax.random.key(3)
    B, N, C = 2, 32, 256
    x = jax.random.normal(key, (B, N, C), jnp.float32)
    gamma = jnp.ones((C,))
    beta = jnp.zeros((C,))
    want = _flax_gn_silu(x, gamma, beta, silu=False)
    got = fused_group_norm_silu(x, gamma, beta, 32, 1e-6, False, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_fused_gn_silu_grads_match_autodiff():
    key = jax.random.key(4)
    B, N, C = 2, 48, 128
    x = jax.random.normal(key, (B, N, C), jnp.float32)
    gamma = jax.random.normal(jax.random.fold_in(key, 1), (C,)) * 0.3 + 1.0
    beta = jax.random.normal(jax.random.fold_in(key, 2), (C,)) * 0.2
    g = jax.random.normal(jax.random.fold_in(key, 3), (B, N, C), jnp.float32)

    def loss_kernel(x, gamma, beta):
        return jnp.sum(fused_group_norm_silu(x, gamma, beta, 32, 1e-6, True, True) * g)

    def loss_ref(x, gamma, beta):
        return jnp.sum(_flax_gn_silu(x, gamma, beta) * g)

    got = jax.grad(loss_kernel, argnums=(0, 1, 2))(x, gamma, beta)
    want = jax.grad(loss_ref, argnums=(0, 1, 2))(x, gamma, beta)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4)


def test_fused_gn_bf16_io():
    key = jax.random.key(5)
    B, N, C = 2, 64, 128
    x = jax.random.normal(key, (B, N, C), jnp.float32)
    gamma, beta = jnp.ones((C,)), jnp.zeros((C,))
    want = _flax_gn_silu(x, gamma, beta)
    got = fused_group_norm_silu(x.astype(jnp.bfloat16), gamma, beta, 32, 1e-6, True, True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want), atol=3e-2
    )


def test_fused_gn_oversized_slab_falls_back():
    # N*C above the VMEM budget must route to the jnp path (and still match)
    key = jax.random.key(6)
    B, N, C = 1, 16384, 128  # 2M elements > budget
    x = jax.random.normal(key, (B, N, C), jnp.float32)
    gamma, beta = jnp.ones((C,)), jnp.zeros((C,))
    want = _flax_gn_silu(x, gamma, beta)
    got = fused_group_norm_silu(x, gamma, beta, 32, 1e-6, True, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_fused_gn_dropout_statistics():
    # interpret-mode hardware-PRNG dropout: ~drop_rate of outputs zero,
    # survivors scaled by 1/(1-p)
    key = jax.random.key(7)
    B, N, C = 4, 128, 128
    p = 0.5
    x = jax.random.normal(key, (B, N, C), jnp.float32)
    gamma, beta = jnp.ones((C,)), jnp.zeros((C,))
    seed = jnp.asarray(1234, jnp.int32)
    y = fused_group_norm_silu(x, gamma, beta, 32, 1e-6, False, True, p, seed)
    base = fused_group_norm_silu(x, gamma, beta, 32, 1e-6, False, True, 0.0, None)
    y, base = np.asarray(y), np.asarray(base)
    kept = y != 0.0
    frac_kept = kept.mean()
    assert abs(frac_kept - (1 - p)) < 0.03, frac_kept
    np.testing.assert_allclose(y[kept], base[kept] / (1 - p), rtol=1e-5)


def test_fused_gn_dropout_bwd_mask_matches_fwd():
    # the backward must regenerate the exact same mask as the forward:
    # recover the mask from y (silu off, gamma=1, beta=0 => y = m * xhat),
    # then compare dx against the analytic GN backward using that mask.
    key = jax.random.key(8)
    B, N, C = 2, 64, 128
    G, p = 32, 0.4
    x = jax.random.normal(key, (B, N, C), jnp.float32)
    gamma, beta = jnp.ones((C,)), jnp.zeros((C,))
    seed = jnp.asarray(77, jnp.int32)

    f = lambda xx: fused_group_norm_silu(xx, gamma, beta, 32, 1e-6, False, True, p, seed)
    y, vjp = jax.vjp(f, x)
    g = jax.random.normal(jax.random.fold_in(key, 1), (B, N, C), jnp.float32)
    (dx,) = vjp(g)

    y, xn, gn = np.asarray(y), np.asarray(x), np.asarray(g)
    m = (y != 0.0).astype(np.float32) / (1 - p)   # recovered keep-scale
    cg = C // G
    xg = xn.reshape(B, N, G, cg)
    mu = xg.mean(axis=(1, 3), keepdims=True)
    var = ((xg - mu) ** 2).mean(axis=(1, 3), keepdims=True)
    rsig = 1.0 / np.sqrt(var + 1e-6)
    xhat = ((xg - mu) * rsig).reshape(B, N, C)
    geff = (gn * m).reshape(B, N, G, cg)
    mean_g = geff.mean(axis=(1, 3), keepdims=True)
    mean_gx = (geff * xhat.reshape(B, N, G, cg)).mean(axis=(1, 3), keepdims=True)
    want = (rsig * (geff - mean_g - xhat.reshape(B, N, G, cg) * mean_gx)).reshape(B, N, C)
    np.testing.assert_allclose(np.asarray(dx), want, atol=2e-4)


def test_fused_gn_dropout_deterministic_per_seed():
    key = jax.random.key(9)
    B, N, C = 2, 64, 128
    x = jax.random.normal(key, (B, N, C), jnp.float32)
    gamma, beta = jnp.ones((C,)), jnp.zeros((C,))
    a = fused_group_norm_silu(x, gamma, beta, 32, 1e-6, True, True, 0.3, jnp.asarray(5, jnp.int32))
    b = fused_group_norm_silu(x, gamma, beta, 32, 1e-6, True, True, 0.3, jnp.asarray(5, jnp.int32))
    c = fused_group_norm_silu(x, gamma, beta, 32, 1e-6, True, True, 0.3, jnp.asarray(6, jnp.int32))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.any(np.asarray(a) != np.asarray(c))


def test_flash_grads_match_dense():
    """The custom VJP (Pallas backward kernels) must match autodiff through
    the dense reference — multi-block so the streaming recurrence and both
    backward grids are exercised."""
    key = jax.random.key(10)
    B, N, C = 2, 256, 128
    q, k, v = (
        jax.random.normal(jax.random.fold_in(key, i), (B, N, C), jnp.float32)
        for i in range(3)
    )
    g = jax.random.normal(jax.random.fold_in(key, 3), (B, N, C), jnp.float32)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, block_q=128, block_k=128) * g)

    def loss_dense(q, k, v):
        return jnp.sum(_dense_attention(q, k, v) * g)

    got = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


def test_flash_grads_single_block():
    key = jax.random.key(11)
    B, N, C = 1, 128, 128
    q, k, v = (
        jax.random.normal(jax.random.fold_in(key, i), (B, N, C), jnp.float32)
        for i in range(3)
    )

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v) ** 2)

    def loss_dense(q, k, v):
        return jnp.sum(_dense_attention(q, k, v) ** 2)

    got = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


def test_unet_use_flash_trains():
    """jax.grad through UNet(use_flash=True) — the round-1 gap where training
    with the flash path simply crashed."""
    from ddpm_tpu.models import UNet

    model = UNet(
        in_channels=3, hid_channels=128, out_channels=3,
        ch_multipliers=(1,), num_res_blocks=1, apply_attn=(True,),
        use_flash=True,
    )
    x = jax.random.normal(jax.random.key(0), (2, 16, 16, 3), jnp.float32)
    t = jnp.zeros((2,), jnp.int32)
    params = model.init(jax.random.key(1), x, t)["params"]

    def loss(p):
        out = model.apply({"params": p}, x, t)
        return jnp.mean(out**2)

    grads = jax.grad(loss)(params)
    leaves = jax.tree.leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert any(np.any(np.asarray(l) != 0) for l in leaves)


# ---------------------------------------------------------------------- #
# GroupNorm statistics kernels (ops/pallas/gn_stats.py)
# ---------------------------------------------------------------------- #

from ddpm_tpu.ops.pallas.gn_stats import (  # noqa: E402
    group_norm_affine,
    row_sums_cross,
    row_sums_sq,
    supports,
)


def test_row_sums_sq_exact():
    x = jax.random.normal(jax.random.key(0), (4, 48, 256), jnp.float32) * 3 + 1
    s1, s2 = row_sums_sq(x, interpret=True)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(x.sum(1)), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s2), np.asarray((x * x).sum(1)), rtol=1e-6)


def test_row_sums_cross_exact():
    x = jax.random.normal(jax.random.key(1), (3, 64, 128), jnp.float32)
    g = jax.random.normal(jax.random.key(2), (3, 64, 128), jnp.float32)
    s1, s2 = row_sums_cross(x, g, interpret=True)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(g.sum(1)), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(s2), np.asarray((x * g).sum(1)), rtol=1e-6, atol=1e-5
    )


def test_row_sums_bf16_input():
    x = (jax.random.normal(jax.random.key(3), (2, 32, 128)) * 2).astype(jnp.bfloat16)
    s1, _ = row_sums_sq(x, interpret=True)
    ref = x.astype(jnp.float32).sum(1)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(ref), rtol=1e-6)


def test_group_norm_affine_matches_flax():
    B, N, C = 4, 48, 256
    x = jax.random.normal(jax.random.key(4), (B, N, C), jnp.float32) * 2 + 0.5
    gamma = jax.random.normal(jax.random.key(5), (C,)) * 0.1 + 1.0
    beta = jax.random.normal(jax.random.key(6), (C,)) * 0.1
    y = group_norm_affine(x, gamma, beta, 32, 1e-6, jnp.float32, True)
    ref = nn.GroupNorm(num_groups=32, epsilon=1e-6).apply(
        {"params": {"scale": gamma, "bias": beta}}, x
    )
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=3e-6)


def test_group_norm_affine_grads_match_flax():
    B, N, C = 2, 32, 128
    x = jax.random.normal(jax.random.key(7), (B, N, C), jnp.float32) * 2
    gamma = jax.random.normal(jax.random.key(8), (C,)) * 0.1 + 1.0
    beta = jnp.zeros((C,))
    cot = jax.random.normal(jax.random.key(9), (B, N, C))

    def mine(x, g, b):
        return (group_norm_affine(x, g, b, 32, 1e-6, jnp.float32, True) * cot).sum()

    def ref(x, g, b):
        y = nn.GroupNorm(num_groups=32, epsilon=1e-6).apply(
            {"params": {"scale": g, "bias": b}}, x
        )
        return (y * cot).sum()

    g1 = jax.grad(mine, argnums=(0, 1, 2))(x, gamma, beta)
    g2 = jax.grad(ref, argnums=(0, 1, 2))(x, gamma, beta)
    for a, b in zip(g1, g2):
        scale = max(1.0, float(jnp.abs(b).max()))
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-5 * scale, rtol=1e-4
        )


def test_gn_stats_supports_predicate():
    assert supports((8, 1024, 128))
    assert supports((8, 784, 256))  # MNIST 28x28: divisor row blocks exist
    assert not supports((8, 1024, 96))  # channels off the lane grid
    assert supports((8, 997, 128))  # prime rows but whole-N block fits VMEM
    assert not supports((8, 1009, 4096))  # prime rows AND too wide to block


# ---- implicit-GEMM conv + GN-stats epilogue (ops/pallas/conv_gn.py) ----

from ddpm_tpu.ops.pallas.conv_gn import (  # noqa: E402
    conv3x3_gn_stats,
    conv3x3_gn_stats_reference,
    gn_from_stats,
)
from ddpm_tpu.ops.pallas import conv_gn as conv_gn_mod  # noqa: E402


def _conv_case(seed=0, B=8, H=16, W=16, C=128):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.05, size=(3, 3, C, C)), jnp.float32)
    b = jnp.asarray(rng.normal(0, 0.1, size=(C,)), jnp.float32)
    return x, w, b


def test_conv_gn_stats_matches_reference():
    x, w, b = _conv_case()
    y0, s10, s20 = conv3x3_gn_stats_reference(x, w, b)
    y1, s11, s21 = conv3x3_gn_stats(x, w, b, 4, True)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), atol=2e-5)
    np.testing.assert_allclose(np.asarray(s11), np.asarray(s10), rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(s21), np.asarray(s20), rtol=1e-5, atol=1e-3
    )


def test_conv_gn_stats_grads_match_reference():
    x, w, b = _conv_case(seed=1)

    def scalarize(f):
        def run(x, w, b):
            y, s1, s2 = f(x, w, b)
            return (
                (y.astype(jnp.float32) ** 2).mean()
                + (s1 * 1e-3).sum()
                + jnp.sqrt(s2 + 1.0).mean()
            )

        return run

    g1 = jax.grad(
        scalarize(lambda x, w, b: conv3x3_gn_stats(x, w, b, 4, True)),
        argnums=(0, 1, 2),
    )(x, w, b)
    g0 = jax.grad(
        scalarize(conv3x3_gn_stats_reference), argnums=(0, 1, 2)
    )(x, w, b)
    for a, r in zip(g1, g0):
        scale = max(1.0, float(jnp.abs(r).max()))
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(r), atol=2e-5 * scale, rtol=1e-4
        )


def test_conv_gn_stats_unsupported_falls_back():
    # 96 channels off the lane grid -> reference path, identical results
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(4, 8, 8, 96)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.1, size=(3, 3, 96, 96)), jnp.float32)
    b = jnp.zeros((96,), jnp.float32)
    assert not conv_gn_mod.supports(x.shape, w.shape)
    y1, s1, s2 = conv3x3_gn_stats(x, w, b, 4, True)
    y0, s10, s20 = conv3x3_gn_stats_reference(x, w, b)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), atol=1e-6)


def test_gn_from_stats_matches_groupnorm_with_embedding_shift():
    # conv -> +emb -> GroupNorm, the ResidualBlock's norm2 input
    # (models/unet.py h + emb[:, None, None, :]): gn_from_stats must equal
    # flax GroupNorm applied to (y + emb) while reading only (s1, s2, emb)
    x, w, b = _conv_case(seed=3)
    y, s1, s2 = conv3x3_gn_stats(x, w, b, 4, True)
    rng = np.random.default_rng(4)
    emb = jnp.asarray(rng.normal(size=(y.shape[0], y.shape[-1])), jnp.float32)
    gamma = jnp.asarray(rng.normal(1.0, 0.1, size=(y.shape[-1],)), jnp.float32)
    beta = jnp.asarray(rng.normal(0, 0.1, size=(y.shape[-1],)), jnp.float32)

    got = gn_from_stats(y, s1, s2, gamma, beta, 32, 1e-6, shift=emb)
    want = nn.GroupNorm(num_groups=32, epsilon=1e-6).apply(
        {"params": {"scale": gamma, "bias": beta}}, y + emb[:, None, None, :]
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_conv_gn_supports_budgets_per_dtype():
    # the CIFAR level-0 shape fits the 8 MiB VMEM budget in bf16 but NOT in
    # f32 (the padded block, double-buffered x/y, and weights all double):
    # supports() must gate on the real itemsize, not assume 2 bytes
    x_shape, w_shape = (128, 32, 32, 128), (3, 3, 128, 128)
    assert conv_gn_mod.supports(x_shape, w_shape, itemsize=2)
    assert not conv_gn_mod.supports(x_shape, w_shape, itemsize=4)
    # default budgets conservatively (f32)
    assert not conv_gn_mod.supports(x_shape, w_shape)
    # a small-enough shape passes either way
    assert conv_gn_mod.supports((8, 8, 8, 128), w_shape, itemsize=4)


from ddpm_tpu.ops.pallas import level_fuse as level_fuse_mod  # noqa: E402
from ddpm_tpu.ops.pallas.level_fuse import (  # noqa: E402
    params_from_module,
    res_attn_fused,
    res_attn_reference,
)


def _level_case(dtype=jnp.float32, B=4, H=16, C=256, seed=0):
    """Real flax modules (models/unet.py) provide both params and oracle."""
    from ddpm_tpu.models.unet import AttentionBlock, ResidualBlock

    key = jax.random.key(seed)
    x = jax.random.normal(key, (B, H, H, C), jnp.float32).astype(dtype)
    t_emb = jax.random.normal(jax.random.fold_in(key, 1), (B, 2 * C), jnp.float32)
    res = ResidualBlock(out_channels=C, dtype=dtype)
    attn = AttentionBlock(dtype=dtype)
    rp = res.init(jax.random.fold_in(key, 2), x, t_emb)["params"]
    r = res.apply({"params": rp}, x, t_emb)
    ap = attn.init(jax.random.fold_in(key, 3), r)["params"]
    y = attn.apply({"params": ap}, r)
    emb = (jax.nn.silu(t_emb) @ rp["fc"]["kernel"] + rp["fc"]["bias"]).astype(dtype)
    return x, emb, params_from_module(rp, ap), y


def test_level_fuse_matches_flax_modules_f32():
    # the fused Res->Attn level equals AttentionBlock(ResidualBlock(x)) run
    # through the actual model modules, params adapted verbatim
    x, emb, p, y_flax = _level_case()
    y_ref = res_attn_reference(x, emb, p)
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_flax), atol=2e-5)
    y_k = res_attn_fused(x, emb, p, block_b=4, interpret=True)
    np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_flax), atol=2e-5)


def test_level_fuse_multiblock_grid():
    # 8 images over 2 grid steps must equal the single-shot reference
    x, emb, p, y_flax = _level_case(B=8, seed=5)
    y_k = res_attn_fused(x, emb, p, block_b=4, interpret=True)
    np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_flax), atol=2e-5)


def test_level_fuse_bf16():
    x, emb, p, _ = _level_case(dtype=jnp.bfloat16, seed=7)
    y_ref = res_attn_reference(x, emb, p)
    y_k = res_attn_fused(x, emb, p, block_b=4, interpret=True)
    # bf16 rounding differs op-by-op; agreement to ~bf16 ulp of the scale
    np.testing.assert_allclose(
        np.asarray(y_k, np.float32), np.asarray(y_ref, np.float32), atol=0.125, rtol=0.05
    )


def test_level_fuse_supports_envelope():
    assert level_fuse_mod.supports((128, 16, 16, 256), block_b=4, itemsize=2)
    # 8x8 measured ~5% slower than XLA op-level and dilutes the end-to-end
    # sampler win (1.18x -> 1.15x) — excluded from the envelope
    assert not level_fuse_mod.supports((128, 8, 8, 256), block_b=4, itemsize=2)
    # N > 256 tokens (32x32) out of envelope; C off the lane grid; cpg < 8
    assert not level_fuse_mod.supports((128, 32, 32, 256))
    assert not level_fuse_mod.supports((128, 16, 16, 192))
    assert not level_fuse_mod.supports((128, 16, 16, 128))
    # unsupported shape falls back to the reference path
    x, emb, p, y_flax = _level_case(C=128, seed=9)
    y = res_attn_fused(x, emb, p, block_b=4, interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_flax), atol=2e-5)


def test_unet_fuse_level_checkpoint_compatible():
    # fuse_level declares the SAME param tree via holders and produces the
    # same eval-mode output through the fused path (interpret kernel) as the
    # module path — so checkpoints are interchangeable
    from ddpm_tpu.models import build_unet
    from ddpm_tpu.ops.pallas import level_fuse as lf_mod

    cfg = {"hid_channels": 64, "ch_multipliers": [1, 2, 4], "num_res_blocks": 1,
           "apply_attn": [False, False, True], "drop_rate": 0.1}
    x = jnp.zeros((4, 32, 32, 3), jnp.float32)
    t = jnp.zeros((4,), jnp.int32)
    m0 = build_unet(cfg, 3)
    m1 = build_unet(cfg, 3, fuse_level=True)
    p0 = m0.init(jax.random.key(0), x, t)["params"]
    old = lf_mod.FORCE_INTERPRET
    lf_mod.FORCE_INTERPRET = True
    try:
        p1 = m1.init(jax.random.key(0), x, t)["params"]
        assert jax.tree.structure(p0) == jax.tree.structure(p1)
        xr = jax.random.normal(jax.random.key(1), x.shape)
        y0 = m0.apply({"params": p0}, xr, t)
        y1 = m1.apply({"params": p0}, xr, t)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), atol=1e-5)
        # training mode routes through the modules (dropout lives there)
        y_tr = m1.apply(
            {"params": p0}, xr, t, train=True,
            rngs={"dropout": jax.random.key(2)},
        )
        assert y_tr.shape == y0.shape
    finally:
        lf_mod.FORCE_INTERPRET = old


def test_level_fuse_c512_hq_level_excluded_but_correct():
    """The CelebA-HQ / blobs256 attention level (16x16x512) is OUTSIDE the
    kernel's VMEM envelope: the resident weights alone are 22*C^2*2B
    ~= 11.5 MB at C=512 (conv1+conv2 18C^2, qkv 3C^2, proj C^2), which
    with the activation blocks exceeds the 12 MB budget at any block_b —
    supporting it would need weight-streaming tiles. supports() must say
    no, and the fused entry point must fall back to the reference path
    with identical results."""
    assert not level_fuse_mod.supports((64, 16, 16, 512), block_b=4, itemsize=2)
    assert not level_fuse_mod.supports((64, 16, 16, 512), block_b=2, itemsize=2)
    x, emb, p, y_flax = _level_case(C=512, seed=11)
    y = res_attn_fused(x, emb, p, block_b=4, interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_flax), atol=3e-5)

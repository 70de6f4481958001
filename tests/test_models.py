"""Shape/structure tests for the UNet and toy Decoder."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddpm_tpu.models import Decoder, UNet
from ddpm_tpu.ops.resample import depth_to_space, space_to_depth


def tiny_unet(**kw):
    cfg = dict(
        in_channels=3,
        hid_channels=32,
        out_channels=3,
        ch_multipliers=(1, 2),
        num_res_blocks=1,
        apply_attn=(False, True),
        drop_rate=0.0,
    )
    cfg.update(kw)
    return UNet(**cfg)


def test_unet_forward_shape():
    model = tiny_unet()
    x = jnp.zeros((2, 16, 16, 3))
    t = jnp.array([0, 999], jnp.int32)
    params = model.init(jax.random.key(0), x, t)["params"]
    out = model.apply({"params": params}, x, t)
    assert out.shape == x.shape
    assert out.dtype == jnp.float32


def test_unet_zero_init_output():
    # out_conv is zero-init (reference unet.py:141): fresh model outputs ~0
    model = tiny_unet()
    x = jax.random.normal(jax.random.key(1), (2, 16, 16, 3))
    t = jnp.array([10, 20], jnp.int32)
    params = model.init(jax.random.key(0), x, t)["params"]
    out = model.apply({"params": params}, x, t)
    assert float(jnp.max(jnp.abs(out))) < 1e-4


def test_unet_dropout_needs_rng():
    model = tiny_unet(drop_rate=0.5)
    x = jnp.zeros((1, 16, 16, 3))
    t = jnp.zeros((1,), jnp.int32)
    params = model.init(jax.random.key(0), x, t)["params"]
    # train=True requires a dropout rng; train=False must be deterministic
    out1 = model.apply({"params": params}, x, t, train=False)
    out2 = model.apply(
        {"params": params}, x, t, train=True, rngs={"dropout": jax.random.key(2)}
    )
    assert out1.shape == out2.shape


def test_unet_param_count_cifar10():
    """Parameter count of the full CIFAR-10 config matches the reference
    UNet's 35.7M (same architecture hyperparameters => same count)."""
    model = UNet(
        in_channels=3,
        hid_channels=128,
        out_channels=3,
        ch_multipliers=(1, 2, 2, 2),
        num_res_blocks=2,
        apply_attn=(False, True, False, False),
        drop_rate=0.1,
    )
    x = jnp.zeros((1, 32, 32, 3))
    t = jnp.zeros((1,), jnp.int32)
    params = jax.eval_shape(lambda: model.init(jax.random.key(0), x, t))["params"]
    n = sum(np.prod(p.shape) for p in jax.tree.leaves(params))
    # torch reference: sum(p.numel()) == 35_746_307
    assert n == 35_746_307, n


def test_unet_block_size():
    model = tiny_unet(block_size=2)
    x = jnp.zeros((1, 32, 32, 3))
    t = jnp.zeros((1,), jnp.int32)
    params = model.init(jax.random.key(0), x, t)["params"]
    out = model.apply({"params": params}, x, t)
    assert out.shape == x.shape


def test_space_depth_roundtrip():
    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 3))
    y = space_to_depth(x, 2)
    assert y.shape == (2, 4, 4, 12)
    assert jnp.allclose(depth_to_space(y, 2), x)


def test_toy_decoder_shape_and_tying():
    model = Decoder(in_features=2, mid_features=32, num_temporal_layers=3)
    x = jnp.zeros((4, 2))
    t = jnp.array([0, 1, 2, 3], jnp.int32)
    params = model.init(jax.random.key(0), x, t)["params"]
    out = model.apply({"params": params}, x, t)
    assert out.shape == (4, 2)
    # weight tying: exactly ONE TemporalLayer parameter subtree regardless of
    # num_temporal_layers (reference toy_model.py:49-50 reuses one instance)
    temporal_keys = [k for k in params if k.startswith("temporal")]
    assert temporal_keys == ["temporal"]


@pytest.mark.parametrize("levels,res", [((1, 2), 16), ((1, 2, 2), 16)])
def test_unet_level_depths(levels, res):
    model = tiny_unet(ch_multipliers=levels, apply_attn=tuple(False for _ in levels))
    x = jnp.zeros((1, res, res, 3))
    t = jnp.zeros((1,), jnp.int32)
    shapes = jax.eval_shape(lambda: model.init(jax.random.key(0), x, t))
    out = jax.eval_shape(
        lambda p: model.apply(p, x, t), shapes
    )
    assert out.shape == x.shape


def test_unet_remat_matches_baseline():
    """remat=True must be numerically identical (fwd and grads) — it only
    changes what is stored vs recomputed in the backward."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ddpm_tpu.models import UNet

    kw = dict(
        in_channels=3, hid_channels=32, out_channels=3,
        ch_multipliers=(1, 2), num_res_blocks=1, apply_attn=(False, True),
        drop_rate=0.0,
    )
    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 3))
    t = jnp.array([3, 7], jnp.int32)
    m0, m1 = UNet(**kw), UNet(**kw, remat=True)
    params = m0.init(jax.random.key(1), x, t)["params"]

    y0 = m0.apply({"params": params}, x, t)
    y1 = m1.apply({"params": params}, x, t)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-6)

    def loss(m):
        return lambda p: jnp.sum(m.apply({"params": p}, x, t) ** 2)

    g0 = jax.grad(loss(m0))(params)
    g1 = jax.grad(loss(m1))(params)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_model_wrapper_matches_block_size_fold():
    """The ModelWrapper shim (space-to-depth around any apply) matches the
    native UNet(block_size=...) fold for an identity-ish model."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ddpm_tpu.models.unet import ModelWrapper
    from ddpm_tpu.ops.resample import depth_to_space, space_to_depth

    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 4))

    def apply_fn(variables, xx, t):
        return xx * 2.0  # channel-preserving toy model

    wrapped = ModelWrapper(apply_fn, 2)
    y = wrapped({}, x, None)
    np.testing.assert_allclose(
        np.asarray(y),
        np.asarray(depth_to_space(space_to_depth(x, 2) * 2.0, 2)),
    )
    assert y.shape == x.shape
    assert ModelWrapper(apply_fn, 1) is apply_fn


def test_dummy_scheduler_api():
    from ddpm_tpu.train import DummyScheduler

    s = DummyScheduler()
    s.init()
    s.step()
    assert s.state_dict() == {}
    s.load_state_dict({})


def test_groupnorm32_matches_flax_groupnorm():
    """The affine-rearranged GroupNorm32 must match nn.GroupNorm exactly
    (same mean/E[x^2] variance, same eps placement) in f32."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ddpm_tpu.nn.modules import GroupNorm32

    key = jax.random.key(0)
    x = jax.random.normal(key, (2, 8, 8, 64)) * 3.0 + 1.0
    gamma = jax.random.normal(jax.random.fold_in(key, 1), (64,)) * 0.2 + 1.0
    beta = jax.random.normal(jax.random.fold_in(key, 2), (64,)) * 0.1

    ref = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=jnp.float32).apply(
        {"params": {"scale": gamma, "bias": beta}}, x
    )
    got = GroupNorm32(num_groups=32).apply(
        {"params": {"GroupNorm_0": {"scale": gamma, "bias": beta}}}, x
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)

    # with_silu folds the activation
    got_silu = GroupNorm32(num_groups=32, with_silu=True).apply(
        {"params": {"GroupNorm_0": {"scale": gamma, "bias": beta}}}, x
    )
    np.testing.assert_allclose(np.asarray(got_silu), np.asarray(nn.silu(ref)), atol=2e-5)


def test_groupnorm32_no_nan_on_constant_large_groups():
    """Regression: E[x^2] - mu^2 rounding negative under f32 cancellation
    must not produce NaN (flax clamps variance at 0; so do we)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ddpm_tpu.nn.modules import GroupNorm32
    from ddpm_tpu.ops.pallas.group_norm import fused_group_norm_silu

    x = 100.0 + 1e-4 * jax.random.normal(jax.random.key(0), (2, 8, 8, 64))
    y = GroupNorm32(num_groups=32).apply(
        {"params": {"GroupNorm_0": {"scale": jnp.ones(64), "bias": jnp.zeros(64)}}}, x
    )
    assert np.isfinite(np.asarray(y)).all()
    yk = fused_group_norm_silu(
        x.reshape(2, 64, 64), jnp.ones(64), jnp.zeros(64), 32, 1e-6, False, True
    )
    assert np.isfinite(np.asarray(yk)).all()


def test_build_unet_plumbs_perf_knobs():
    """The perf knobs (fuse_gn / use_flash / gn_pallas_stats) are reachable
    end-to-end: via build_unet kwargs and via model-config keys, with the
    config winning (same precedence as remat). The knobs change no
    parameters — a gn_pallas_stats model evaluates identically on the jnp
    fallback path (ADVICE round 2: the flag used to be module-level-only)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ddpm_tpu.models.unet import build_unet

    m = build_unet({}, 3, gn_pallas_stats=True, fuse_gn=False, use_flash=True)
    assert m.gn_pallas_stats and m.use_flash and not m.fuse_gn
    m2 = build_unet({"gn_pallas_stats": False, "use_flash": False}, 3,
                    gn_pallas_stats=True, use_flash=True)
    assert not m2.gn_pallas_stats and not m2.use_flash  # config wins

    base = build_unet({"hid_channels": 32, "ch_multipliers": [1, 2],
                       "apply_attn": [False, True], "num_res_blocks": 1}, 3)
    knob = build_unet({"hid_channels": 32, "ch_multipliers": [1, 2],
                       "apply_attn": [False, True], "num_res_blocks": 1,
                       "gn_pallas_stats": True}, 3)
    x = jax.random.normal(jax.random.key(0), (2, 16, 16, 3))
    t = jnp.array([3, 7])
    v = base.init(jax.random.key(1), x, t)
    assert jax.tree.structure(v) == jax.tree.structure(knob.init(jax.random.key(1), x, t))
    np.testing.assert_allclose(
        np.asarray(base.apply(v, x, t)), np.asarray(knob.apply(v, x, t)), atol=0
    )


def test_unet_fuse_conv_gn_matches_unfused():
    """The fused conv1+GN-stats path (ops/pallas/conv_gn.py) must produce
    the same forward output and accept the same parameter tree as the
    nn.Conv + GroupNorm32 path — checkpoints are interchangeable."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ddpm_tpu.models import UNet
    from ddpm_tpu.ops.pallas import conv_gn

    kw = dict(
        in_channels=3, hid_channels=128, out_channels=3,
        ch_multipliers=(1, 2), num_res_blocks=1, apply_attn=(False, False),
        drop_rate=0.0,
    )
    x = jax.random.normal(jax.random.key(0), (4, 8, 8, 3))
    t = jnp.array([0, 100, 500, 999], jnp.int32)

    plain = UNet(**kw)
    params = plain.init(jax.random.key(1), x, t)["params"]
    y_plain = plain.apply({"params": params}, x, t)

    fused = UNet(fuse_conv_gn=True, **kw)
    conv_gn.FORCE_INTERPRET = True
    try:
        params_fused = fused.init(jax.random.key(1), x, t)["params"]
        assert jax.tree.structure(params_fused) == jax.tree.structure(params)
        y_fused = fused.apply({"params": params}, x, t)
    finally:
        conv_gn.FORCE_INTERPRET = False
    np.testing.assert_allclose(
        np.asarray(y_fused), np.asarray(y_plain), atol=5e-5
    )

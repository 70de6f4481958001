"""End-to-end training tests: toy convergence, sharded step, EMA, accum."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddpm_tpu.data.toy import Gaussian8
from ddpm_tpu.diffusion.toy import ToyGaussianDiffusion
from ddpm_tpu.math import get_beta_schedule
from ddpm_tpu.models import Decoder
from ddpm_tpu.parallel import batch_sharding, make_mesh, shard_batch
from ddpm_tpu.train import TrainState, make_optimizer, make_sample_fn, make_train_step


def make_toy_setup(T=50, mid=32, num_accum=1):
    betas = get_beta_schedule("linear", 1e-4, 0.02, T)
    diffusion = ToyGaussianDiffusion.create(betas, "eps", "fixed-small", "mse")
    model = Decoder(in_features=2, mid_features=mid, num_temporal_layers=2)
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 2)), jnp.zeros((1,), jnp.int32)
    )["params"]
    tx = make_optimizer(lr=1e-3, grad_norm=1.0, warmup=10)
    state = TrainState.create(params, tx, ema_decay=0.999, num_accum=num_accum)
    return model, diffusion, state


def test_toy_training_reduces_loss():
    model, diffusion, state = make_toy_setup()
    step = make_train_step(model.apply, diffusion)
    data = Gaussian8(4096, random_state=7).data
    key = jax.random.key(42)

    losses = []
    for i in range(60):
        batch = jnp.asarray(data[(i * 64) % 4096 : (i * 64) % 4096 + 64])
        key, sub = jax.random.split(key)
        state, loss = step(state, batch, sub)
        losses.append(float(loss))
    first, last = np.mean(losses[:10]), np.mean(losses[-10:])
    assert last < first * 0.7, (first, last)
    assert int(state.step) == 60


def test_toy_convergence_regression():
    """CI-speed pin of end-to-end distribution learning (gaussian8).

    Scaled-down version of the full head-to-head recorded in PARITY.md
    (reference protocol: toy_utils.py:152-163): train at the reference toy
    hyperparameter *shapes* (T=100 linear 1e-3..0.2, eps/fixed-large/mse,
    no grad clip) for 1200 steps, then histogram-KLD 10k generated vs 10k
    true points. Measured on this setup: untrained 17.4, 600 steps 1.75,
    1200 steps 0.57, plateau ~0.4 — so < 1.0 at 1200 steps separates
    "learns the distribution" from "broken" with wide margin both ways.
    """
    from ddpm_tpu.metrics.toy import ToyEvaluator

    betas = get_beta_schedule("linear", 1e-3, 0.2, 100)
    diffusion = ToyGaussianDiffusion.create(betas, "eps", "fixed-large", "mse")
    model = Decoder(in_features=2, mid_features=64, num_temporal_layers=2)
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 2)), jnp.zeros((1,), jnp.int32)
    )["params"]
    tx = make_optimizer(lr=1e-3, grad_norm=0.0, warmup=100)
    state = TrainState.create(params, tx, use_ema=False)
    step = make_train_step(model.apply, diffusion)

    data = Gaussian8(16384, random_state=1234).data
    key = jax.random.key(1234)
    for i in range(1200):
        lo = (i * 512) % (16384 - 512)
        key, sub = jax.random.split(key)
        state, _ = step(state, jnp.asarray(data[lo : lo + 512]), sub)

    sample_fn = make_sample_fn(model.apply, diffusion, (10000, 2), clip_denoised=False)
    evaluator = ToyEvaluator(data, total_size=10000, batch_size=10000)
    skey = jax.random.key(99)
    kld = evaluator.eval(lambda n, i: sample_fn(state, skey)[:n])["kld"]
    assert np.isfinite(kld) and kld < 1.0, kld


def test_toy_sampling_shape_and_finite():
    model, diffusion, state = make_toy_setup()
    sample_fn = make_sample_fn(model.apply, diffusion, (16, 2), clip_denoised=False)
    out = sample_fn(state, jax.random.key(0))
    assert out.shape == (16, 2)
    assert bool(jnp.isfinite(out).all())


def test_sharded_train_step(eight_devices):
    mesh = make_mesh(eight_devices)
    model, diffusion, state = make_toy_setup()
    step = make_train_step(model.apply, diffusion, mesh=mesh)
    from jax.sharding import NamedSharding, PartitionSpec as P

    state = jax.device_put(state, NamedSharding(mesh, P()))
    batch = shard_batch(jnp.zeros((16, 2)), mesh)
    state, loss = step(state, batch, jax.random.key(0))
    assert int(state.step) == 1
    assert np.isfinite(float(loss))
    # loss is a replicated global mean
    assert loss.sharding.is_fully_replicated


def test_ema_warmup_decay():
    """decay_t = min(decay, (1+n)/(10+n)) with n incremented BEFORE the decay
    computation (reference utils/train.py:300-305) — first update uses n=1,
    so effective decay is 2/11."""
    model, diffusion, state = make_toy_setup()
    p0 = jax.tree.map(jnp.copy, state.params)
    step = make_train_step(model.apply, diffusion)
    batch = jnp.asarray(Gaussian8(64, random_state=3).data)
    state, _ = step(state, batch, jax.random.key(1))
    # after 1 update: ema = (2/11) * p0 + (9/11) * p1
    d = 2.0 / 11.0
    expect = jax.tree.map(lambda a, b: d * a + (1 - d) * b, p0, state.params)
    chex_close = jax.tree.map(
        lambda a, b: np.allclose(a, b, atol=1e-6), expect, state.ema_params
    )
    assert all(jax.tree.leaves(chex_close))


def test_grad_accumulation_updates_every_nth():
    model, diffusion, state = make_toy_setup(num_accum=2)
    step = make_train_step(model.apply, diffusion)
    batch = jnp.asarray(Gaussian8(32, random_state=5).data)
    key = jax.random.key(9)
    state, _ = step(state, batch, key)
    assert int(state.step) == 0  # buffered only
    state, _ = step(state, batch, jax.random.fold_in(key, 1))
    assert int(state.step) == 1  # applied
    assert int(state.accum_step) == 2


def test_warmup_schedule_values():
    from ddpm_tpu.train import warmup_schedule

    sched = warmup_schedule(2e-4, 5000)
    assert np.isclose(float(sched(0)), 2e-4 / 5000)
    assert np.isclose(float(sched(4999)), 2e-4)
    assert np.isclose(float(sched(100000)), 2e-4)


def test_warmup_schedule_epoch_stride_matches_per_epoch_lambdalr():
    # the toy trainer's reference steps LambdaLR once per epoch
    # (toy_utils.py:92-93): during epoch e the multiplier is min((e+1)/W, 1)
    from ddpm_tpu.train import warmup_schedule

    sched = warmup_schedule(1.0, 5, stride=10)
    for step, want in [(0, 0.2), (9, 0.2), (10, 0.4), (40, 1.0), (120, 1.0)]:
        assert np.isclose(float(sched(step)), want), step


def test_checkpoint_roundtrip(tmp_path):
    from ddpm_tpu.train import load_checkpoint, save_checkpoint

    model, diffusion, state = make_toy_setup()
    step = make_train_step(model.apply, diffusion)
    batch = jnp.asarray(Gaussian8(64, random_state=3).data)
    state, _ = step(state, batch, jax.random.key(1))
    save_checkpoint(state, str(tmp_path), epoch=3, extra={"loss": 0.5})

    _, _, template = make_toy_setup()
    restored, start_epoch = load_checkpoint(template, str(tmp_path))
    assert start_epoch == 3
    assert int(restored.step) == 1
    same = jax.tree.map(
        lambda a, b: np.allclose(a, b), state.params, restored.params
    )
    assert all(jax.tree.leaves(same))


def test_trainer_rejects_evaluator_without_sample_shape(tmp_path):
    """Passing an evaluator without sample_shape must fail at train() entry
    with an actionable message, not a TypeError at the first checkpoint
    interval."""
    from ddpm_tpu.data import get_dataloader
    from ddpm_tpu.train.trainer import Trainer

    model, diffusion, state = make_toy_setup()
    loader, _ = get_dataloader(
        "fakedata", batch_size=8, split="train", resolution=8, size=16
    )
    trainer = Trainer(
        model=model, diffusion=diffusion, state=state, trainloader=loader,
        epochs=1, sample_shape=None, logger=lambda *_: None,
    )
    with pytest.raises(ValueError, match="sample_shape"):
        trainer.train(evaluator=object(), chkpt_dir=str(tmp_path))


def test_trainer_in_loop_eval_and_checkpoint(tmp_path):
    """Full Trainer.train() loop with an in-loop Evaluator and checkpointing:
    exercises the dedicated per-size eval sampler, the padded-free streaming
    FID path, image grids, and the orbax save (reference
    utils/train.py:191-234 responsibilities)."""
    from ddpm_tpu.data import get_dataloader
    from ddpm_tpu.metrics import Evaluator
    from ddpm_tpu.models import UNet
    from ddpm_tpu.train.trainer import Trainer

    T = 5
    betas = get_beta_schedule("linear", 1e-4, 0.02, T)
    from ddpm_tpu.diffusion import GaussianDiffusion

    diffusion = GaussianDiffusion.create(betas, "eps", "fixed-large", "mse")
    model = UNet(
        in_channels=3, hid_channels=32, out_channels=3,
        ch_multipliers=(1, 2), num_res_blocks=1, apply_attn=(False, True),
        drop_rate=0.1,
    )
    x = jnp.zeros((4, 8, 8, 3), jnp.float32)
    t = jnp.zeros((4,), jnp.int32)
    params = model.init(jax.random.key(0), x, t)["params"]
    tx = make_optimizer(lr=1e-3, grad_norm=1.0, warmup=10)
    state = TrainState.create(params, tx, ema_decay=0.999)

    loader, _ = get_dataloader(
        "fakedata", batch_size=8, split="train", resolution=8, size=16
    )
    trainer = Trainer(
        model=model,
        diffusion=diffusion,
        state=state,
        trainloader=loader,
        epochs=1,
        sample_size=8,
        sample_shape=(8, 8, 3),
        image_intv=1,
        chkpt_intv=1,
        logger=lambda *_: None,
    )

    def extractor(x01):
        xb = np.asarray(x01, np.float32).reshape(len(x01), -1)
        return xb[:, :: max(1, xb.shape[1] // 8)][:, :8]

    ev = Evaluator(
        "fakedata", total_size=12, batch_size=8,
        precomputed_dir=str(tmp_path / "pre"), extractor=extractor,
    )
    trainer.train(
        evaluator=ev,
        chkpt_dir=str(tmp_path / "c"),
        image_dir=str(tmp_path / "i"),
    )
    import os
    assert os.path.exists(str(tmp_path / "i" / "1.png"))
    assert any(os.scandir(str(tmp_path / "c")))
    # the eval sampler cache holds the evaluator's batch size, not sample_size
    assert 8 in trainer._eval_samplers


def test_checkpoint_ema_mismatch_and_epoch_path(tmp_path):
    """A run saved without EMA loads into an EMA-carrying state (EMA falls
    back to the restored params), and --chkpt-path may point either at the
    run dir or directly at an epoch dir."""
    from ddpm_tpu.train.checkpoint import (
        load_checkpoint,
        resolve_checkpoint,
        save_checkpoint,
    )

    model, diffusion, state_noema = make_toy_setup()
    state_noema = state_noema.replace(ema_params=None)
    save_checkpoint(state_noema, str(tmp_path), 3, {"loss": 1.0})

    run_dir, ep = resolve_checkpoint(str(tmp_path / "3"))
    assert run_dir == str(tmp_path) and ep == 3
    run_dir2, ep2 = resolve_checkpoint(str(tmp_path))
    assert run_dir2 == str(tmp_path) and ep2 is None

    _, _, template = make_toy_setup()  # EMA-carrying template
    restored, epoch = load_checkpoint(template, str(tmp_path / "3"))
    assert epoch == 3
    assert restored.ema_params is not None
    p0 = jax.tree.leaves(restored.params)[0]
    e0 = jax.tree.leaves(restored.ema_params)[0]
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(e0))


def test_sharded_training_matches_single_device(eight_devices):
    """3 training steps on an 8-device data-parallel mesh must produce the
    same losses and parameters as the identical run on a 1-device mesh —
    the SPMD partitioning is an implementation detail, not a semantics
    change (DDP gradient-averaging equivalence, utils/train.py:148-165)."""
    from ddpm_tpu.parallel import make_mesh, shard_batch

    def run(n_dev):
        model, diffusion, state = make_toy_setup()
        mesh = make_mesh(jax.devices()[:n_dev])
        from jax.sharding import NamedSharding, PartitionSpec as P

        state = jax.device_put(state, NamedSharding(mesh, P()))
        step = make_train_step(model.apply, diffusion, mesh=mesh)
        key = jax.random.key(42)
        x = jax.random.normal(jax.random.fold_in(key, 99), (16, 2))
        losses = []
        for i in range(3):
            batch = shard_batch(x, mesh)
            state, loss = step(state, batch, jax.random.fold_in(key, i))
            losses.append(float(loss))
        return losses, jax.tree.leaves(state.params)

    l1, p1 = run(1)
    l8, p8 = run(8)
    np.testing.assert_allclose(l1, l8, rtol=1e-5)
    for a, b in zip(p1, p8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_addressable_rows_sharded(eight_devices):
    """addressable_rows returns the global rows (< limit) this host owns —
    on a single host over an 8-device mesh that is exactly np[:limit]."""
    from ddpm_tpu.parallel import addressable_rows, make_mesh, shard_batch

    mesh = make_mesh()
    x = np.arange(16 * 3, dtype=np.float32).reshape(16, 3)
    g = shard_batch(jnp.asarray(x), mesh)
    np.testing.assert_array_equal(addressable_rows(g), x)
    np.testing.assert_array_equal(addressable_rows(g, 10), x[:10])
    assert addressable_rows(g, 0).shape == (0, 3)


def test_checkpoint_reverse_ema_mismatch(tmp_path):
    """A checkpoint saved WITH EMA must load into a state WITHOUT EMA (the
    extra saved subtree is skipped via partial restore)."""
    from ddpm_tpu.train.checkpoint import load_checkpoint, save_checkpoint

    model, diffusion, state_ema = make_toy_setup()
    assert state_ema.ema_params is not None
    save_checkpoint(state_ema, str(tmp_path), 2)

    _, _, template = make_toy_setup()
    template = template.replace(ema_params=None)
    restored, epoch = load_checkpoint(template, str(tmp_path))
    assert epoch == 2 and restored.ema_params is None


def test_resolve_checkpoint_digit_named_run_dir(tmp_path):
    """A digit-named RUN directory (e.g. --exp-name 128) must not be
    mistaken for an epoch directory."""
    from ddpm_tpu.train.checkpoint import resolve_checkpoint, save_checkpoint

    model, diffusion, state = make_toy_setup()
    run = tmp_path / "128"
    run.mkdir()
    save_checkpoint(state, str(run), 5)
    # the run dir itself -> (run, None); the epoch dir inside -> (run, 5)
    assert resolve_checkpoint(str(run)) == (str(run), None)
    assert resolve_checkpoint(str(run / "5")) == (str(run), 5)


def test_rbg_key_wrap_impl_agnostic():
    from ddpm_tpu.train.step import _rbg_key

    for impl in ("threefry2x32", "rbg", "unsafe_rbg"):
        k = jax.random.key(7, impl=impl)
        rk = _rbg_key(k)
        assert jax.random.key_data(rk).shape == (4,)
        # usable: draws bits without error
        jax.random.bernoulli(rk, 0.5, (4,))


def test_kl_loss_training_step():
    """VLB ('kl') loss trains: every step's loss is finite and positive
    (reference diffusion.py:203-215 term; t=0 decoder NLL included)."""
    from ddpm_tpu.diffusion import GaussianDiffusion
    from ddpm_tpu.models import UNet

    betas = get_beta_schedule("linear", 1e-4, 0.02, 10)
    diffusion = GaussianDiffusion.create(betas, "eps", "fixed-small", "kl")
    model = UNet(in_channels=3, hid_channels=32, out_channels=3,
                 ch_multipliers=(1, 2), num_res_blocks=1,
                 apply_attn=(False, False), drop_rate=0.0)
    x = jax.random.normal(jax.random.key(0), (4, 8, 8, 3)) * 0.5
    params = model.init(jax.random.key(1), x, jnp.zeros((4,), jnp.int32))["params"]
    tx = make_optimizer(lr=1e-3, grad_norm=1.0)
    state = TrainState.create(params, tx)
    step = make_train_step(model.apply, diffusion)
    key = jax.random.key(2)
    losses = []
    for i in range(4):
        state, loss = step(state, jnp.clip(x, -1, 1), jax.random.fold_in(key, i))
        losses.append(float(loss))
    assert all(np.isfinite(l) and l > 0 for l in losses), losses


def test_learned_variance_training_step():
    """'learned' model_var_type: the model emits 2C channels (mean-param +
    logvar, reference diffusion.py:112) and trains under the kl loss."""
    from ddpm_tpu.diffusion import GaussianDiffusion
    from ddpm_tpu.models import UNet

    betas = get_beta_schedule("linear", 1e-4, 0.02, 10)
    diffusion = GaussianDiffusion.create(betas, "eps", "learned", "kl")
    model = UNet(in_channels=3, hid_channels=32, out_channels=6,
                 ch_multipliers=(1, 2), num_res_blocks=1,
                 apply_attn=(False, False), drop_rate=0.0)
    x = jnp.clip(jax.random.normal(jax.random.key(0), (4, 8, 8, 3)) * 0.5, -1, 1)
    params = model.init(jax.random.key(1), x, jnp.zeros((4,), jnp.int32))["params"]
    tx = make_optimizer(lr=1e-3, grad_norm=1.0)
    state = TrainState.create(params, tx)
    step = make_train_step(model.apply, diffusion)
    state, loss = step(state, x, jax.random.key(2))
    assert np.isfinite(float(loss))
    # sampling with learned variance also runs
    fn = make_sample_fn(model.apply, diffusion, (4, 8, 8, 3), use_ema=False)
    y = fn(state, jax.random.key(3))
    assert np.isfinite(np.asarray(y)).all()


def test_kl_loss_falls_over_training():
    """Training under the VLB ('kl') loss LEARNS, not just runs: on a fixed
    structured batch the running loss after 30 optimizer steps is well below
    the starting loss (regression pin for the kl training path, reference
    diffusion.py:203-215; VERDICT r3 item 2)."""
    # the toy stack (continuous t=0 NLL, reference toy/diffusion.py:52-64):
    # on images the fixed-variance VLB is dominated by the near-singular t=1
    # KL term (the very pathology that led Ho et al. to the simplified mse
    # objective), so the clean falling-loss pin lives where the reference's
    # own kl experiments do — the 2-D toy processes
    betas = get_beta_schedule("linear", 1e-3, 0.2, 50)
    diffusion = ToyGaussianDiffusion.create(betas, "eps", "fixed-small", "kl")
    model = Decoder(in_features=2, mid_features=64, num_temporal_layers=2)
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 2)), jnp.zeros((1,), jnp.int32)
    )["params"]
    state = TrainState.create(
        params, make_optimizer(lr=1e-3, grad_norm=1.0), use_ema=False
    )
    step = make_train_step(model.apply, diffusion)
    data = Gaussian8(8192, random_state=7).data
    eval_loss = _deterministic_kl_eval(model, diffusion, jnp.asarray(data[:64]))
    before = eval_loss(state.params)  # ~0.84 at init on this seed
    key, B = jax.random.key(1), 256
    losses = []
    for i in range(200):
        lo = (i * B) % (8192 - B)
        state, loss = step(state, jnp.asarray(data[lo : lo + B]), jax.random.fold_in(key, i))
        losses.append(float(loss))
    assert all(np.isfinite(l) for l in losses), losses[:5]
    after = eval_loss(state.params)  # measured ~0.13 at 100 steps already
    assert after < 0.3 * before, (before, after)


def _deterministic_kl_eval(model, diffusion, x):
    """Fixed-(t, noise) VLB evaluator: every timestep appears equally and the
    noise draw is frozen, so two calls differ only through the params — the
    per-step training loss is far too t-sampling-noisy to compare directly
    (the kl term spans orders of magnitude across t)."""
    B, T = x.shape[0], diffusion.timesteps
    reps = (T,) + (1,) * (x.ndim - 1)
    xx = jnp.tile(x, reps)  # every example at every t
    t = jnp.repeat(jnp.arange(T, dtype=jnp.int32), B)
    noise = jax.random.normal(jax.random.key(7), xx.shape)

    @jax.jit
    def f(params):
        def denoise(x_t, tt):
            return model.apply({"params": params}, x_t, tt, train=False)

        return diffusion.train_losses(denoise, xx, t, noise).mean()

    return lambda params: float(f(params))


def test_learned_variance_loss_falls_over_training():
    """The 'learned' channel-split variance head (reference diffusion.py:
    110-118) trains under kl for 30 steps without NaNs and the loss falls
    (VERDICT r3 item 2: 'implemented' for a loss means a model trains)."""
    from ddpm_tpu.diffusion import GaussianDiffusion
    from ddpm_tpu.models import UNet

    betas = get_beta_schedule("linear", 1e-4, 0.02, 8)
    diffusion = GaussianDiffusion.create(betas, "eps", "learned", "kl")
    model = UNet(in_channels=3, hid_channels=32, out_channels=6,
                 ch_multipliers=(1, 2), num_res_blocks=1,
                 apply_attn=(False, False), drop_rate=0.0)
    g = jnp.linspace(-0.8, 0.8, 8)
    x = jnp.stack([jnp.broadcast_to(g[None, :, None] * s, (8, 8, 3))
                   for s in (1.0, -1.0, 0.5, -0.5)])
    params = model.init(jax.random.key(1), x, jnp.zeros((4,), jnp.int32))["params"]
    tx = make_optimizer(lr=3e-3, grad_norm=1.0)
    state = TrainState.create(params, tx, use_ema=False)
    step = make_train_step(model.apply, diffusion)
    eval_loss = _deterministic_kl_eval(model, diffusion, x)
    before = eval_loss(state.params)
    key = jax.random.key(2)
    losses = []
    for i in range(30):
        state, loss = step(state, x, jax.random.fold_in(key, i))
        losses.append(float(loss))
    assert all(np.isfinite(l) for l in losses), losses
    after = eval_loss(state.params)
    assert after < 0.5 * before, (before, after)


def test_uint8_batch_matches_normalized_float_batch():
    """device_normalize path: a uint8 batch through the train step produces
    the identical loss as the pre-normalized float batch (same formula,
    u8/127.5 - 1, applied on device)."""
    from ddpm_tpu.data import get_dataloader
    from ddpm_tpu.diffusion import GaussianDiffusion
    from ddpm_tpu.models import UNet

    betas = get_beta_schedule("linear", 1e-4, 0.02, 10)
    diffusion = GaussianDiffusion.create(betas, "eps", "fixed-large", "mse")
    model = UNet(in_channels=3, hid_channels=32, out_channels=3,
                 ch_multipliers=(1, 2), num_res_blocks=1,
                 apply_attn=(False, False), drop_rate=0.0)
    u8 = np.random.RandomState(0).randint(0, 256, (8, 8, 8, 3), np.uint8)
    f32 = u8.astype(np.float32) / 127.5 - 1.0
    params = model.init(jax.random.key(1), jnp.asarray(f32), jnp.zeros((8,), jnp.int32))["params"]
    tx = make_optimizer(lr=1e-3)

    def one_step(batch):
        # fresh param copies per call: the fused step donates its state
        state = TrainState.create(jax.tree.map(jnp.copy, params), tx)
        step = make_train_step(model.apply, diffusion)
        _, loss = step(state, jnp.asarray(batch), jax.random.key(5))
        return float(loss)

    assert one_step(u8) == one_step(f32)

    # loader yields uint8 when asked, with flips applied host-side
    loader, _ = get_dataloader(
        "fakedata", 8, split="train", resolution=8, size=16,
        device_normalize=True,
    )
    b = next(iter(loader))
    assert b.dtype == np.uint8


def test_trainer_prefetch_preserves_order_and_dry_run(tmp_path):
    """The one-slot prefetch must yield every batch exactly once, in order,
    and dry_run must still stop after the first optimizer update."""
    from ddpm_tpu.data import get_dataloader
    from ddpm_tpu.diffusion import GaussianDiffusion
    from ddpm_tpu.models import UNet
    from ddpm_tpu.train.trainer import Trainer

    betas = get_beta_schedule("linear", 1e-4, 0.02, 5)
    diffusion = GaussianDiffusion.create(betas, "eps", "fixed-large", "mse")
    model = UNet(in_channels=3, hid_channels=32, out_channels=3,
                 ch_multipliers=(1, 2), num_res_blocks=1,
                 apply_attn=(False, False), drop_rate=0.0)
    params = model.init(
        jax.random.key(0), jnp.zeros((2, 8, 8, 3)), jnp.zeros((2,), jnp.int32)
    )["params"]
    state = TrainState.create(params, make_optimizer(lr=1e-3))
    loader, _ = get_dataloader(
        "fakedata", 8, split="train", resolution=8, size=24,
        device_normalize=True,
    )
    trainer = Trainer(
        model=model, diffusion=diffusion, state=state, trainloader=loader,
        epochs=1, sample_shape=None, logger=lambda *_: None,
    )
    # prefetch yields all batches, in loader order
    loader.set_epoch(0)
    want = [np.asarray(b) for b in loader]
    got = [np.asarray(b) for b in trainer._prefetched()]
    assert len(got) == len(want) == 3
    for a, b in zip(got, want):
        np.testing.assert_array_equal(a, b)
    # dry_run: exactly one optimizer update
    trainer.dry_run = True
    trainer.train()
    assert int(trainer.state.step) == 1


def test_trainer_intra_epoch_logging_count_weighted(tmp_path):
    """Per-batch observability: with log_intv set, the Trainer emits running
    count-weighted loss lines mid-epoch (reference tqdm postfix,
    utils/train.py:206-212) and the epoch mean weights batches by size."""
    from ddpm_tpu.data import get_dataloader
    from ddpm_tpu.diffusion import GaussianDiffusion
    from ddpm_tpu.models import UNet
    from ddpm_tpu.train.trainer import Trainer

    betas = get_beta_schedule("linear", 1e-4, 0.02, 5)
    diffusion = GaussianDiffusion.create(betas, "eps", "fixed-large", "mse")
    model = UNet(
        in_channels=3, hid_channels=32, out_channels=3,
        ch_multipliers=(1,), num_res_blocks=1, apply_attn=(False,),
    )
    x = jnp.zeros((4, 8, 8, 3), jnp.float32)
    params = model.init(jax.random.key(0), x, jnp.zeros((4,), jnp.int32))["params"]
    state = TrainState.create(params, make_optimizer(lr=1e-3), use_ema=False)
    loader, _ = get_dataloader(
        "fakedata", batch_size=8, split="train", resolution=8, size=32
    )
    msgs = []
    trainer = Trainer(
        model=model, diffusion=diffusion, state=state, trainloader=loader,
        epochs=1, sample_shape=None, log_intv=2, chkpt_intv=10**9,
        logger=msgs.append,
    )
    trainer.train()
    progress = [m for m in msgs if "[" in m]
    assert progress, f"no intra-epoch progress lines in {msgs}"
    assert "[2/4]" in progress[0]
    # count-weighted accumulation saw all 32 examples by epoch end
    assert trainer.stats.count == 32
    summary = [m for m in msgs if "imgs/s" in m]
    assert summary and "epoch 1/1" in summary[0]


def test_sample_fn_for_eval_requires_sample_shape():
    from ddpm_tpu.data import get_dataloader
    from ddpm_tpu.diffusion import GaussianDiffusion
    from ddpm_tpu.models import UNet
    from ddpm_tpu.train.trainer import Trainer

    betas = get_beta_schedule("linear", 1e-4, 0.02, 5)
    diffusion = GaussianDiffusion.create(betas, "eps", "fixed-large", "mse")
    model = UNet(
        in_channels=3, hid_channels=32, out_channels=3,
        ch_multipliers=(1,), num_res_blocks=1, apply_attn=(False,),
    )
    x = jnp.zeros((4, 8, 8, 3), jnp.float32)
    params = model.init(jax.random.key(0), x, jnp.zeros((4,), jnp.int32))["params"]
    state = TrainState.create(params, make_optimizer(lr=1e-3), use_ema=False)
    loader, _ = get_dataloader(
        "fakedata", batch_size=8, split="train", resolution=8, size=16
    )
    trainer = Trainer(
        model=model, diffusion=diffusion, state=state, trainloader=loader,
        epochs=1, sample_shape=None, logger=lambda *_: None,
    )
    with pytest.raises(ValueError, match="sample_shape"):
        trainer.sample_fn_for_eval()


def test_trainer_device_cache_matches_host_pipeline(tmp_path):
    """Device-cache staging (on-device gather+flip from the HBM-resident
    dataset) must produce bit-identical batches to the host pipeline and
    train identically (same losses) on the 8-device mesh."""
    from ddpm_tpu.data import get_dataloader
    from ddpm_tpu.diffusion import GaussianDiffusion
    from ddpm_tpu.models import UNet
    from ddpm_tpu.train.trainer import Trainer

    betas = get_beta_schedule("linear", 1e-4, 0.02, 5)
    diffusion = GaussianDiffusion.create(betas, "eps", "fixed-large", "mse")
    model = UNet(in_channels=3, hid_channels=32, out_channels=3,
                 ch_multipliers=(1, 2), num_res_blocks=1,
                 apply_attn=(False, False), drop_rate=0.0)
    params = model.init(
        jax.random.key(0), jnp.zeros((2, 8, 8, 3)), jnp.zeros((2,), jnp.int32)
    )["params"]

    def run(device_cache):
        loader, _ = get_dataloader(
            "fakedata", 8, split="train", resolution=8, size=24,
            device_normalize=True, yield_indices=device_cache,
        )
        # fresh param buffers per run: the fused train step donates the
        # state, so reusing one pytree across trainers would pass deleted
        # buffers to the second run
        state = TrainState.create(
            jax.tree.map(jnp.array, params), make_optimizer(lr=1e-3)
        )
        trainer = Trainer(
            model=model, diffusion=diffusion, state=state, trainloader=loader,
            epochs=1, sample_shape=None, logger=lambda *_: None,
        )
        loader.set_epoch(0)
        if device_cache:
            # (idx, flips) descriptors: reconstruct what the in-step gather
            # will see; the loss equality below is the device-side proof
            batches = []
            for idx, flips in trainer._prefetched():
                want = loader.dataset.images[idx].copy()
                f = flips.astype(bool)
                want[f] = want[f, :, ::-1]
                batches.append(want)
        else:
            batches = [np.asarray(b) for b in trainer._prefetched()]
        trainer.train()
        return batches, float(trainer.stats.extract()["loss"])

    host_batches, host_loss = run(False)
    dev_batches, dev_loss = run(True)
    assert len(host_batches) == len(dev_batches) == 3
    for a, b in zip(host_batches, dev_batches):
        np.testing.assert_array_equal(a, b)
    # identical batches through the from_indices step => identical training
    assert np.isclose(host_loss, dev_loss, rtol=1e-6)

"""Benchmark: CIFAR-10 DDPM training throughput (imgs/sec/chip).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

``value`` is the pure fused-step rate over a 390-step chained window with a
single final value-fetch sync; ``sustained_trainer_imgs_per_sec`` is the
full production Trainer.train loop (uint8 loader + prefetch + logging +
stacked loss drain) over 390-batch epochs — both numbers the round-4
reconciliation (docs/performance.md "Step rate vs sustained rate",
logs/reconcile_r04.json) showed must be reported together: short windows
overstate step time by ~1.5 ms/step of amortized tunnel sync, which is how
round 3 ended up with a "sustained loop faster than its step" paradox.

Workload anchor: configs/cifar10.json (batch 128, UNet hid=128, mult
(1,2,2,2), 2 res blocks, attention at 16x16, T=1000, eps/fixed-large/mse) —
the same training step the reference runs per iteration
(ddpm_torch/utils/train.py:148-165), fused here into one jitted XLA program.

``vs_baseline`` compares against a measured PyTorch-on-A100 per-chip figure
for this exact workload. The reference publishes no speed numbers
(SURVEY.md §6), so the baseline constant below is our own measured/estimated
A100 number; until a co-located A100 measurement exists it is an estimate
(~420 imgs/s for DDPM CIFAR-10 UNet fp32 batch128 with channels-last+TF32).
"""

from __future__ import annotations

import json
import os
import re
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)

import jax
import jax.numpy as jnp

BASELINE_IMGS_PER_SEC_PER_CHIP = 420.0  # PyTorch A100 estimate (see docstring)

BATCH = 128
STEPS = 390  # steady-state window; final-sync tunnel round trip amortizes to ~0.1 ms/step
WARMUP = 5
TRAINER_EPOCHS = 2  # sustained arm: epoch 1 warms the u8 program, epoch 2 is measured


def main():
    from ddpm_tpu.diffusion import GaussianDiffusion
    from ddpm_tpu.math import get_beta_schedule
    from ddpm_tpu.models import UNet
    from ddpm_tpu.parallel import make_mesh, shard_batch
    from ddpm_tpu.train import TrainState, make_optimizer, make_train_step

    n_chips = jax.device_count()
    mesh = make_mesh()

    betas = get_beta_schedule("linear", 1e-4, 0.02, 1000)
    diffusion = GaussianDiffusion.create(betas, "eps", "fixed-large", "mse")
    model = UNet(
        in_channels=3,
        hid_channels=128,
        out_channels=3,
        ch_multipliers=(1, 2, 2, 2),
        num_res_blocks=2,
        apply_attn=(False, True, False, False),
        drop_rate=0.1,
        dtype=jnp.bfloat16,
    )
    x = jnp.zeros((BATCH, 32, 32, 3), jnp.float32)
    t = jnp.zeros((BATCH,), jnp.int32)
    params = model.init(jax.random.key(0), x, t)["params"]
    tx = make_optimizer(lr=2e-4, grad_norm=1.0, warmup=5000)
    state = TrainState.create(params, tx, ema_decay=0.9999)

    from jax.sharding import NamedSharding, PartitionSpec as P

    state = jax.device_put(state, NamedSharding(mesh, P()))
    step = make_train_step(model.apply, diffusion, has_dropout=True, mesh=mesh)
    batch = shard_batch(x, mesh)

    key = jax.random.key(0)
    for i in range(WARMUP):
        state, loss = step(state, batch, jax.random.fold_in(key, i))
    # Sync via an actual value fetch: on remotely-attached devices (axon
    # tunnel) block_until_ready can return before execution finishes, which
    # inflates throughput ~9x. float() cannot lie.
    float(loss)

    t0 = time.perf_counter()
    for i in range(STEPS):
        state, loss = step(state, batch, jax.random.fold_in(key, WARMUP + i))
    float(loss)
    dt = time.perf_counter() - t0

    imgs_per_sec_per_chip = BATCH * STEPS / dt / n_chips
    sampling = ddpm_sampling_rate(model, diffusion, state, mesh, n_chips)
    sustained = sustained_trainer_rate(model, diffusion, state, mesh, n_chips)
    print(
        json.dumps(
            {
                "metric": "cifar10_train_imgs_per_sec_per_chip",
                "value": round(imgs_per_sec_per_chip, 2),
                "unit": "imgs/sec/chip",
                "vs_baseline": round(imgs_per_sec_per_chip / BASELINE_IMGS_PER_SEC_PER_CHIP, 3),
                "step_window": STEPS,
                "sustained_trainer_imgs_per_sec": round(sustained, 2),
                **sampling,
            }
        )
    )


def ddpm_sampling_rate(model, diffusion, state, mesh, n_chips) -> dict:
    """BASELINE.json's sampling north star: 1000-step ancestral DDPM
    samples/sec (+MFU), same CIFAR-10 arch, batch 128 — the whole chain is
    one lax.scan program on device. MFU accounting multiplies the scanned
    body's cost-analysis FLOPs by the chain length and refuses to report an
    implausible figure (ddpm_tpu.utils.profiling.mfu guard)."""
    from ddpm_tpu.train import make_sample_fn
    from ddpm_tpu.utils.profiling import flops_per_item, mfu

    sample = make_sample_fn(
        model.apply, diffusion, (BATCH, 32, 32, 3), use_ema=False, mesh=mesh
    )
    key = jax.random.key(7)
    flops = flops_per_item(sample, BATCH, state, key, chain=diffusion.timesteps)
    x = sample(state, key)  # compile + warm
    float(x[0, 0, 0, 0])
    t0 = time.perf_counter()
    reps = 2
    for i in range(reps):
        x = sample(state, jax.random.fold_in(key, i))
    float(x[0, 0, 0, 0])
    rate = BATCH * reps / (time.perf_counter() - t0) / n_chips
    out = {"ddpm_samples_per_sec_per_chip": round(rate, 2)}
    try:
        util = mfu(rate, flops)
        out["ddpm_sample_mfu"] = round(util, 4) if util is not None else None
    except AssertionError as e:
        # record the guard trip loudly instead of losing the train metric
        out["ddpm_sample_mfu"] = None
        out["ddpm_sample_mfu_error"] = str(e)
    return out


def sustained_trainer_rate(model, diffusion, state, mesh, n_chips) -> float:
    """Full Trainer.train loop (u8 loader + prefetch + logging + loss drain).

    Mirrors scripts/bench_reconcile.py's trainer_ema arm at reduced epoch
    count: the per-epoch log line's imgs/s is the sustained rate; epoch 1
    absorbs the uint8-input program compile (cache-warm: seconds), epoch 2+
    is steady state.
    """
    from ddpm_tpu.data import get_dataloader
    from ddpm_tpu.train import Trainer

    loader, _ = get_dataloader(
        "fakedata", BATCH, "train", size=BATCH * 390, device_normalize=True
    )
    rates: list[float] = []

    def logger(msg):
        m = re.search(r"\(([0-9.]+) imgs/s\)", msg)
        if m:
            rates.append(float(m.group(1)))

    trainer = Trainer(
        model, diffusion, state, loader, epochs=TRAINER_EPOCHS, mesh=mesh,
        image_intv=10**9, chkpt_intv=10**9, logger=logger,
    )
    trainer.train()
    best = max(rates[1:]) if len(rates) > 1 else rates[-1]
    return best / n_chips


if __name__ == "__main__":
    main()

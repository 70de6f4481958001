"""Reconcile the pure-step rate vs the sustained Trainer-loop rate.

Round-3 left a contradiction (VERDICT r3 weak-1): bench.py reported the
fused CIFAR-10 step at 3,405 imgs/s while the full Trainer loop in
logs/blobs_drainfix.log sustained 3,607 imgs/s — a loop cannot beat its
inner step. Two confounds were suspected:

  1. EMA: bench.py builds TrainState with use_ema=True (the production
     default) but the drainfix run used --no EMA (use_ema=False), skipping
     the per-step EMA tree update (advisor r3 finding #3).
  2. Window-sync amortization: bench.py's chained loop pays ONE value-fetch
     tunnel round trip (~35 ms) per STEPS-step window; at STEPS=30 that
     inflates per-step time by ~1 ms, while the Trainer's 390-batch epochs
     amortize their sync to ~0.1 ms/step.

This script measures each arm on the same chip in one process:

  step_ema30 / step_ema120 / step_ema390   chained fused step, use_ema=True,
                                           window sizes 30/120/390 — the
                                           fixed window-sync overhead falls
                                           out of the differences
  step_noema120                            same at 120 steps, use_ema=False —
                                           isolates the EMA update cost
  trainer_ema / trainer_noema              the REAL Trainer.train epoch loop
                                           (prefetch + logging + loss drain),
                                           390 batches/epoch fakedata, both
                                           EMA settings
  trainer_ema_naivedrain                   same as trainer_ema but with
                                           _drain_losses monkeypatched back
                                           to per-scalar float() fetches —
                                           the round-3 drain fix A/B, now
                                           with MATCHED use_ema (advisor r3)

Usage: python scripts/bench_reconcile.py [--out logs/reconcile.json]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

BATCH = 128


def _build(use_ema: bool):
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ddpm_tpu.diffusion import GaussianDiffusion
    from ddpm_tpu.math import get_beta_schedule
    from ddpm_tpu.models import build_unet
    from ddpm_tpu.parallel import make_mesh, shard_batch
    from ddpm_tpu.train import TrainState, make_optimizer
    from ddpm_tpu.utils.config import load_config

    cfg = load_config("cifar10")
    mesh = make_mesh()
    dcfg = cfg["diffusion"]
    betas = get_beta_schedule(
        dcfg["beta_schedule"], dcfg["beta_start"], dcfg["beta_end"], dcfg["timesteps"]
    )
    diffusion = GaussianDiffusion.create(
        betas, dcfg["model_mean_type"], dcfg["model_var_type"], dcfg["loss_type"]
    )
    model = build_unet(cfg["model"], 3, dtype=jnp.bfloat16)
    x = jnp.zeros((BATCH, 32, 32, 3), jnp.float32)
    t = jnp.zeros((BATCH,), jnp.int32)
    params = jax.jit(model.init)(jax.random.key(0), x, t)["params"]
    tx = make_optimizer(lr=2e-4, grad_norm=1.0, warmup=5000)
    state = TrainState.create(params, tx, ema_decay=0.9999, use_ema=use_ema)
    state = jax.device_put(state, NamedSharding(mesh, P()))
    return model, diffusion, state, mesh, shard_batch(x, mesh)


def chained_step_rate(use_ema: bool, steps: int) -> float:
    from ddpm_tpu.train import make_train_step

    model, diffusion, state, mesh, x = _build(use_ema)
    step = make_train_step(model.apply, diffusion, has_dropout=True, mesh=mesh)
    key = jax.random.key(0)
    for i in range(5):
        state, loss = step(state, x, jax.random.fold_in(key, i))
    float(loss)
    t0 = time.perf_counter()
    for i in range(steps):
        state, loss = step(state, x, jax.random.fold_in(key, 10 + i))
    float(loss)
    dt = time.perf_counter() - t0
    return BATCH * steps / dt / jax.device_count()


def _rss_mb() -> int:
    with open(f"/proc/{os.getpid()}/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) // 1024
    return -1


def trainer_rate(use_ema: bool, naive_drain: bool = False, batches: int = 390,
                 epochs: int = 3, device_cache: bool = False) -> float:
    from ddpm_tpu.data import get_dataloader
    from ddpm_tpu.train import Trainer

    model, diffusion, state, mesh, _ = _build(use_ema)
    loader, _ = get_dataloader(
        "fakedata", BATCH, "train", size=BATCH * batches, device_normalize=True,
        yield_indices=device_cache,
    )
    rates = []

    def logger(msg):
        m = re.search(r"\(([0-9.]+) imgs/s\)", msg)
        if m:
            rates.append(float(m.group(1)))

    trainer = Trainer(
        model, diffusion, state, loader, epochs=epochs, mesh=mesh,
        image_intv=10**9, chkpt_intv=10**9, logger=logger,
    )
    if naive_drain:
        # the pre-round-3 drain: one ~35 ms tunnel round trip PER window batch
        def naive(pending):
            for n, loss in pending:
                trainer.stats.update(n, loss=float(loss))

        trainer._drain_losses = naive
    rss0 = _rss_mb()
    trainer.train()
    print(json.dumps({"rss_before_mb": rss0, "rss_after_mb": _rss_mb(),
                      "device_cache": device_cache}), flush=True)
    return max(rates[1:]) if len(rates) > 1 else rates[-1]


ARMS = {
    "step_ema30": lambda: chained_step_rate(True, 30),
    "step_ema120": lambda: chained_step_rate(True, 120),
    "step_ema390": lambda: chained_step_rate(True, 390),
    "step_noema120": lambda: chained_step_rate(False, 120),
    "trainer_ema": lambda: trainer_rate(True),
    "trainer_noema": lambda: trainer_rate(False),
    "trainer_ema_naivedrain": lambda: trainer_rate(True, naive_drain=True),
    # round-4: HBM-resident dataset, on-device gather — ~1 KB/step of
    # host->device traffic instead of the pixel batch (loader.py docstring)
    "trainer_devcache": lambda: trainer_rate(True, device_cache=True),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="")
    ap.add_argument("--arms", default=",".join(ARMS))
    args = ap.parse_args()
    results = {}
    if args.out and os.path.exists(args.out):
        with open(args.out) as f:
            results.update(json.load(f))  # resume partial runs

    for name in args.arms.split(","):
        t0 = time.time()
        results[name] = round(ARMS[name](), 1)
        print(json.dumps({"arm": name, "imgs_per_s_per_chip": results[name],
                          "wall_s": round(time.time() - t0, 1)}), flush=True)
        if args.out:
            with open(args.out, "w") as f:
                json.dump(results, f, indent=2)

    ms = {k: 1000.0 * BATCH / v for k, v in results.items()}
    print("\nper-step ms:", {k: round(v, 2) for k, v in ms.items()})
    if all(k in ms for k in ARMS):
        print(f"window-sync overhead (30 vs 390): "
              f"{ms['step_ema30'] - ms['step_ema390']:+.2f} ms/step")
        print(f"EMA update cost (chained, 120): "
              f"{ms['step_ema120'] - ms['step_noema120']:+.2f} ms/step")
        print(f"trainer loop vs chained step (both EMA): "
              f"{ms['trainer_ema'] - ms['step_ema390']:+.2f} ms/step")
        print(f"drain fix, matched EMA: naive {results['trainer_ema_naivedrain']} "
              f"-> stacked {results['trainer_ema']} imgs/s "
              f"({results['trainer_ema'] / results['trainer_ema_naivedrain']:.2f}x)")
    if args.out:
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

"""Capture a device trace of the CIFAR-10 train step and bucket op time.

Reproduces the profile table in docs/performance.md: runs the exact bench.py
workload under ``jax.profiler``, then parses the xplane with
``jax.profiler.ProfileData`` and aggregates per-op durations into named
buckets (conv fusions, GN statistics reductions, optimizer elementwise,
layout copies, RNG, rest).

Usage:  python scripts/profile_step.py [--steps 5] [--logdir /tmp/ddpm_prof]
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def build_step():
    from ddpm_tpu.diffusion import GaussianDiffusion
    from ddpm_tpu.math import get_beta_schedule
    from ddpm_tpu.models import UNet
    from ddpm_tpu.parallel import make_mesh, shard_batch
    from ddpm_tpu.train import TrainState, make_optimizer, make_train_step
    from jax.sharding import NamedSharding, PartitionSpec as P

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
    x = jnp.zeros((128, 32, 32, 3), jnp.float32)
    t = jnp.zeros((128,), jnp.int32)
    params = model.init(jax.random.key(0), x, t)["params"]
    tx = make_optimizer(lr=2e-4, grad_norm=1.0, warmup=5000)
    state = TrainState.create(params, tx, ema_decay=0.9999)
    state = jax.device_put(state, NamedSharding(mesh, P()))
    step = make_train_step(model.apply, diffusion, has_dropout=True, mesh=mesh)
    batch = shard_batch(x, mesh)
    return step, state, batch


def _op_base(name: str) -> str:
    """'%convert_reduce_fusion.3 = ...' -> '%convert_reduce_fusion'."""
    import re

    return re.sub(r"\.\d+$", "", name.split(" = ")[0])


def summarize(logdir: str, steps: int):
    from jax.profiler import ProfileData

    paths = sorted(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True))
    if not paths:
        raise SystemExit(f"no xplane.pb under {logdir}")
    prof = ProfileData.from_file(paths[-1])
    plane = prof.find_plane_with_name("/device:TPU:0")
    if plane is None:
        raise SystemExit("no /device:TPU:0 plane in trace")
    per_op = collections.defaultdict(float)
    per_base = collections.defaultdict(float)
    counts = collections.Counter()
    for line in plane.lines:
        # Only the synchronous TensorCore timeline. "Async XLA Ops" events
        # (copy-start/slice-start DMA windows) overlap compute — summing
        # their durations double-counts massively.
        if line.name != "XLA Ops":
            continue
        for ev in line.events:
            dur_ms = ev.duration_ns / 1e6
            per_op[ev.name] += dur_ms
            base = _op_base(ev.name)
            per_base[base] += dur_ms
            counts[base] += 1
    total = sum(per_base.values())
    if not total:
        print("no device ops in trace (capture interrupted or taken before any step ran?)")
        return
    print(f"\n== op-name totals over {steps} steps (ms/step, TensorCore-serial) ==")
    for b, ms in sorted(per_base.items(), key=lambda kv: -kv[1])[:20]:
        print(
            f"  {ms / steps:8.3f}  n={counts[b] // steps:5d}  ({100 * ms / total:5.1f}%)  {b}"
        )
    print(f"  {'TOTAL':>8s}  {total / steps:8.2f} ms/step")
    print(f"\n== top 25 individual ops (ms/step) ==")
    for name, ms in sorted(per_op.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {ms / steps:8.3f}  {name[:120]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--logdir", default="/tmp/ddpm_prof")
    ap.add_argument("--summarize-only", action="store_true")
    args = ap.parse_args()

    if not args.summarize_only:
        from ddpm_tpu.utils.profiling import value_sync

        step, state, batch = build_step()
        key = jax.random.key(0)
        for i in range(3):
            state, loss = step(state, batch, jax.random.fold_in(key, i))
        value_sync(loss)
        import shutil

        shutil.rmtree(args.logdir, ignore_errors=True)
        jax.profiler.start_trace(args.logdir)
        for i in range(args.steps):
            state, loss = step(state, batch, jax.random.fold_in(key, 100 + i))
        value_sync(loss)
        jax.profiler.stop_trace()
    summarize(args.logdir, args.steps)


if __name__ == "__main__":
    main()

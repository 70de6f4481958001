"""A/B the whole-level Res->Attn Pallas program against XLA, on the real chip.

The round-3 conv_gn post-mortem (docs/performance.md) concluded the only
route left past the custom-call layout tax is owning an ENTIRE UNet level as
one kernel. ops/pallas/level_fuse.py is that kernel (eval-mode forward:
GN+SiLU -> conv1 -> +emb -> GN+SiLU -> conv2 -> +x -> GN -> qkv ->
softmax(QK^T/sqrt(C))V -> proj -> +r). This script measures it both ways the
verdict needs:

  1. op level: a DEPTH-deep lax.scan chain of the unit, fused kernel vs the
     identical plain-XLA subgraph (res_attn_reference) — same operands, same
     dtype, single value-fetch sync (tunnel rules, docs/performance.md).
  2. in situ: the unit sandwiched between two 3x3 convs (XLA-owned
     producer/consumer), so the entry/exit layout boundary the previous four
     attacks died on is part of the measurement.

  python scripts/bench_level_fuse.py [--batch 128] [--hw 16] [--ch 256]
       [--depth 6] [--iters 5] [--block-b 4] [--fp32]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

from ddpm_tpu.ops.pallas.level_fuse import res_attn_fused, res_attn_reference, supports


def make_params(rng, C):
    g = lambda *s: jnp.asarray(rng.normal(0, 0.05, s), jnp.float32)  # noqa: E731
    return {
        "gn1_scale": g(C) + 1.0, "gn1_bias": g(C),
        "conv1_w": g(3, 3, C, C), "conv1_b": g(C),
        "gn2_scale": g(C) + 1.0, "gn2_bias": g(C),
        "conv2_w": g(3, 3, C, C) * 0.2, "conv2_b": g(C),
        "gn3_scale": g(C) + 1.0, "gn3_bias": g(C),
        "qkv_w": g(C, 3 * C), "qkv_b": g(3 * C),
        "proj_w": g(C, C) * 0.2, "proj_b": g(C),
    }


def bench(fn, args_, iters, sync):
    out = fn(*args_)  # compile + warm
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args_)
    sync(out)
    return (time.perf_counter() - t0) / iters


def sampler_ab(args):
    """End-to-end sampler A/B with fuse_level off vs on, same params.

    --sampler-config celeba: the CelebA arch (attention at 16x16x256 — the
    kernel's native shape; 3 fusible units per model call: down_2_0,
    down_2_1, mid). --sampler-config cifar10: the CIFAR-10 arch (attention
    at level 1, also 16x16x256; its extra fusible unit set per supports()).
    --ddpm benches the 1000-step ancestral chain instead of DDIM-50."""
    from ddpm_tpu.diffusion import GaussianDiffusion, ddim_from_betas, get_selection_schedule
    from ddpm_tpu.math import get_beta_schedule
    from ddpm_tpu.models import build_unet
    from ddpm_tpu.parallel import make_mesh
    from ddpm_tpu.train import TrainState, make_optimizer, make_sample_fn
    from ddpm_tpu.utils.config import load_config

    cfg = load_config(args.sampler_config)
    res = {"cifar10": 32, "celeba": 64}[args.sampler_config]
    mesh = make_mesh()
    dcfg = cfg["diffusion"]
    betas = get_beta_schedule(
        dcfg["beta_schedule"], dcfg["beta_start"], dcfg["beta_end"], dcfg["timesteps"]
    )
    if args.ddpm:
        chain = f"DDPM-{dcfg['timesteps']}"
        diffusion = GaussianDiffusion.create(
            betas, dcfg["model_mean_type"], dcfg["model_var_type"], dcfg["loss_type"]
        )
    else:
        chain = "DDIM-50"
        subsequence = get_selection_schedule("linear", 50, dcfg["timesteps"])
        diffusion = ddim_from_betas(
            betas, dcfg["model_mean_type"], dcfg["model_var_type"], dcfg["loss_type"],
            eta=0.0, subsequence=subsequence,
        )
    batch = args.batch
    x = jnp.zeros((batch, res, res, 3), jnp.float32)
    t = jnp.zeros((batch,), jnp.int32)
    rates = {}
    params = None
    for name, fuse in [("xla", False), ("fused", True)]:
        model = build_unet(cfg["model"], 3, dtype=jnp.bfloat16, fuse_level=fuse)
        if params is None:
            params = jax.jit(model.init)(jax.random.key(0), x, t)["params"]
        state = TrainState.create(params, make_optimizer(lr=2e-4), use_ema=False)
        sample = make_sample_fn(
            model.apply, diffusion, (batch, res, res, 3), use_ema=False, mesh=mesh
        )
        key = jax.random.key(0)
        out = sample(state, key)
        float(jnp.asarray(out).astype(jnp.float32).mean())
        t0 = time.perf_counter()
        for i in range(args.iters):
            out = sample(state, jax.random.fold_in(key, i))
        float(jnp.asarray(out).astype(jnp.float32).mean())
        dt = time.perf_counter() - t0
        rates[name] = batch * args.iters / dt
        print(f"{name:6s}: {chain} {args.sampler_config}-{res} sampler "
              f"{rates[name]:8.2f} imgs/s")
    print(f"sampler speedup ({args.sampler_config} {chain}): "
          f"{rates['fused'] / rates['xla']:.3f}x")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", default=128, type=int)
    ap.add_argument("--hw", default=16, type=int)
    ap.add_argument("--ch", default=256, type=int)
    ap.add_argument("--depth", default=6, type=int)
    ap.add_argument("--iters", default=5, type=int)
    ap.add_argument("--block-b", default=4, type=int)
    ap.add_argument("--fp32", action="store_true")
    ap.add_argument("--sampler-config", choices=["celeba", "cifar10"],
                    default="celeba")
    ap.add_argument("--ddpm", action="store_true",
                    help="with --sampler: bench the 1000-step ancestral "
                    "chain instead of DDIM-50")
    ap.add_argument("--sampler", action="store_true",
                    help="end-to-end DDIM-50 celeba-64 sampler A/B instead "
                    "of the unit-chain measurement")
    args = ap.parse_args()
    if args.sampler:
        return sampler_ab(args)

    dtype = jnp.float32 if args.fp32 else jnp.bfloat16
    B, HW, C = args.batch, args.hw, args.ch
    assert supports((B, HW, HW, C), args.block_b, np.dtype(dtype).itemsize), \
        "shape outside the validated kernel envelope"
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, HW, HW, C)), dtype)
    emb = jnp.asarray(rng.normal(0, 0.05, (B, C)), jnp.float32)
    p = make_params(rng, C)
    sandwich_w = jnp.asarray(rng.normal(0, 0.05, (3, 3, C, C)), jnp.float32)

    unit_xla = lambda h: res_attn_reference(h, emb, p)  # noqa: E731
    unit_fused = lambda h: res_attn_fused(h, emb, p, args.block_b)  # noqa: E731

    def chain(unit):
        def run(h):
            def body(carry, _):
                return unit(carry).astype(dtype), None

            h, _ = jax.lax.scan(body, h, None, length=args.depth)
            return (h.astype(jnp.float32) ** 2).mean()

        return jax.jit(run)

    def sandwiched(unit):
        # conv -> unit -> conv: XLA owns the producing/consuming layouts, so
        # any entry/exit copies the custom call forces are inside the timing
        def conv(h):
            return jax.lax.conv_general_dilated(
                h, sandwich_w.astype(dtype), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        def run(h):
            def body(carry, _):
                return conv(unit(conv(carry))).astype(dtype), None

            h, _ = jax.lax.scan(body, h, None, length=args.depth)
            return (h.astype(jnp.float32) ** 2).mean()

        return jax.jit(run)

    def sync(v):
        float(v)  # value fetch — honest sync over the axon tunnel

    results = {}
    for name, unit in [("xla", unit_xla), ("fused", unit_fused)]:
        t_op = bench(chain(unit), (x,), args.iters, sync)
        t_situ = bench(sandwiched(unit), (x,), args.iters, sync)
        results[name] = (t_op, t_situ)
        print(
            f"{name:6s}: unit {t_op / args.depth * 1e3:7.3f} ms   "
            f"sandwiched(conv-unit-conv) {t_situ / args.depth * 1e3:7.3f} ms"
        )

    ya, yb = unit_xla(x), unit_fused(x)
    diff = float(jnp.abs(ya.astype(jnp.float32) - yb.astype(jnp.float32)).max())
    print(f"max abs diff xla vs fused (one unit, {np.dtype(dtype).name}): {diff:.3e}")
    a, b = results["xla"], results["fused"]
    print(f"speedup: unit {a[0] / b[0]:.3f}x   sandwiched {a[1] / b[1]:.3f}x")


if __name__ == "__main__":
    main()

"""A/B the implicit-GEMM conv+GN-stats kernel against XLA, on the real chip.

Measures the ResidualBlock's fusable sub-chain at the CIFAR-10 level-0 shape
(the docs/performance.md round-3 target: 32x32, 128ch, batch 128, bf16):

    x -> [3x3 conv + bias] -> (+ t-emb broadcast) -> GroupNorm32 -> SiLU

  variant A (XLA):   lax conv; GN reads the activation back for E[x], E[x^2]
  variant B (fused): conv3x3_gn_stats emits (y, s1, s2) from the conv
                     epilogue; gn_from_stats folds the emb shift in algebra

Both variants are wrapped in a lax.scan of DEPTH chained layers (weights
shared, activations carried) so per-layer time amortizes dispatch, and are
sandwiched so the custom call sees realistic producer/consumer layouts.
Timing follows the repo's tunnel rules (docs/performance.md): sync by
fetching a computed value, never block_until_ready.

  python scripts/bench_conv_gn.py [--batch 128] [--hw 32] [--ch 128]
       [--depth 8] [--iters 5] [--block-b 4] [--fp32]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

from ddpm_tpu.ops.pallas.conv_gn import conv3x3_gn_stats, gn_from_stats


def make_layers(ch, dtype, block_b):
    def gn_xla(h, scale, bias, num_groups=32, eps=1e-6):
        # the production GroupNorm32 form (nn/modules.py): f32 stats read
        # back from the activation, affine-rearranged apply in compute dtype
        b, hh, ww, c = h.shape
        xf = h.astype(jnp.float32).reshape(b, -1, num_groups, c // num_groups)
        mu = xf.mean(axis=(1, 3), keepdims=True)
        var = (xf * xf).mean(axis=(1, 3), keepdims=True) - mu * mu
        rs = jax.lax.rsqrt(var + eps)
        a = (rs * scale.reshape(1, 1, num_groups, -1).astype(jnp.float32))
        bb = bias.reshape(1, 1, num_groups, -1).astype(jnp.float32) - mu * a
        y = (xf * a + bb).reshape(h.shape)
        return y.astype(h.dtype)

    def layer_xla(h, p):
        y = jax.lax.conv_general_dilated(
            h, p["w"].astype(h.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + p["b"].astype(h.dtype)
        y = y + p["emb"].astype(h.dtype)[:, None, None, :]
        return jax.nn.silu(gn_xla(y, p["scale"], p["bias"]))

    def layer_fused(h, p):
        y, s1, s2 = conv3x3_gn_stats(
            h, p["w"].astype(h.dtype), p["b"].astype(h.dtype), block_b
        )
        return jax.nn.silu(
            gn_from_stats(y, s1, s2, p["scale"], p["bias"], shift=p["emb"])
        )

    return layer_xla, layer_fused


def bench(fn, args, iters, sync):
    """Queue ``iters`` async dispatches, sync ONCE at the end — a per-call
    value fetch costs a ~35 ms tunnel round-trip (docs/performance.md) that
    would swamp ms-scale kernels."""
    out = fn(*args)  # compile + warm
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", default=128, type=int)
    ap.add_argument("--hw", default=32, type=int)
    ap.add_argument("--ch", default=128, type=int)
    ap.add_argument("--depth", default=8, type=int)
    ap.add_argument("--iters", default=5, type=int)
    ap.add_argument("--block-b", default=4, type=int)
    ap.add_argument("--fp32", action="store_true")
    args = ap.parse_args()

    dtype = jnp.float32 if args.fp32 else jnp.bfloat16
    B, HW, C = args.batch, args.hw, args.ch
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, HW, HW, C)), dtype)
    params = {
        "w": jnp.asarray(rng.normal(0, 0.05, (3, 3, C, C)), jnp.float32),
        "b": jnp.asarray(rng.normal(0, 0.05, (C,)), jnp.float32),
        "emb": jnp.asarray(rng.normal(0, 0.05, (B, C)), jnp.float32),
        "scale": jnp.asarray(rng.normal(1, 0.05, (C,)), jnp.float32),
        "bias": jnp.asarray(rng.normal(0, 0.05, (C,)), jnp.float32),
    }
    layer_xla, layer_fused = make_layers(C, dtype, args.block_b)

    def chain(layer):
        def run(x, p):
            def body(h, _):
                return layer(h, p), None

            h, _ = jax.lax.scan(body, x, None, length=args.depth)
            return (h.astype(jnp.float32) ** 2).mean()

        return run

    def sync(v):
        float(v)  # value fetch — honest sync over the axon tunnel

    results = {}
    for name, layer in [("xla", layer_xla), ("fused", layer_fused)]:
        fwd = jax.jit(chain(layer))
        fb = jax.jit(jax.value_and_grad(chain(layer)))
        t_f = bench(fwd, (x, params), args.iters, sync)
        t_fb = bench(
            fb, (x, params), args.iters, lambda out: float(out[0])
        )
        results[name] = (t_f, t_fb)
        print(
            f"{name:6s}: fwd {t_f / args.depth * 1e3:7.3f} ms/layer   "
            f"fwd+bwd {t_fb / args.depth * 1e3:7.3f} ms/layer"
        )

    # numeric cross-check at the benchmarked dtype
    ya = layer_xla(x, params)
    yb = layer_fused(x, params)
    diff = float(jnp.abs(ya.astype(jnp.float32) - yb.astype(jnp.float32)).max())
    print(f"max abs diff xla vs fused (one layer, {dtype.__name__}): {diff:.3e}")
    fa, fb_ = results["xla"], results["fused"]
    print(
        f"speedup: fwd {fa[0] / fb_[0]:.3f}x   fwd+bwd {fa[1] / fb_[1]:.3f}x"
    )


if __name__ == "__main__":
    main()

"""Full-chain VLB (bits/dim) evaluation of a trained checkpoint.

Runs ``GaussianDiffusion.calc_all_bpd`` — the reference's full variational
bound evaluation (ddpm_torch/diffusion.py:245-268): one q_sample + posterior
KL term per timestep t (decoder NLL at t=0) plus the prior KL, all as a
single on-device lax.scan — over held-out batches of a dataset, and reports
total / prior / per-term bits-per-dim.

  python scripts/eval_bpd.py --dataset blobs --chkpt-path chkpts/blobs_flagship \
      --use-ema --batch-size 64 --num-examples 256

Appends a results line to metrics.txt (same convention as eval.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config-path", type=str)
    ap.add_argument("--config-dir", default=None, type=str)
    ap.add_argument("--dataset", default="cifar10")
    ap.add_argument("--root", default="~/datasets", type=str)
    ap.add_argument("--split", default="test",
                    help="held-out split for the bound (reference evaluates "
                    "the VLB on data the model did not train on)")
    ap.add_argument("--chkpt-dir", default="./chkpts", type=str)
    ap.add_argument("--chkpt-path", default="", type=str)
    ap.add_argument("--use-ema", action="store_true")
    ap.add_argument("--batch-size", default=64, type=int)
    ap.add_argument("--num-examples", default=256, type=int)
    ap.add_argument("--seed", default=1234, type=int)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--no-clip-denoised", action="store_true")
    args = ap.parse_args()

    from ddpm_tpu import (
        DATASET_INFO,
        GaussianDiffusion,
        build_unet,
        get_beta_schedule,
        get_dataloader,
        resolve_config,
    )
    from ddpm_tpu.train import TrainState, load_checkpoint, make_optimizer

    config = resolve_config(args.dataset, args.config_path, args.config_dir)
    dataset = (config or {}).get("dataset", args.dataset)
    diff_cfg = (config or {}).get("diffusion") or {}
    model_cfg = (config or {}).get("model") or {}

    timesteps = diff_cfg.get("timesteps", 1000)
    betas = get_beta_schedule(
        diff_cfg.get("beta_schedule", "linear"),
        diff_cfg.get("beta_start", 1e-4),
        diff_cfg.get("beta_end", 0.02),
        timesteps,
    )
    diffusion = GaussianDiffusion.create(
        betas,
        diff_cfg.get("model_mean_type", "eps"),
        diff_cfg.get("model_var_type", "fixed-large"),
        diff_cfg.get("loss_type", "mse"),
    )

    from ddpm_tpu.train.checkpoint import latest_epoch, resolve_checkpoint

    chkpt = args.chkpt_path or os.path.join(args.chkpt_dir, f"ddpm_{dataset}")
    chkpt_run, chkpt_epoch = resolve_checkpoint(chkpt)
    if chkpt_epoch is None and latest_epoch(chkpt_run) is None:
        raise SystemExit(f"error: no checkpoint found under {chkpt!r}")

    info = DATASET_INFO[dataset]
    res, channels = info["resolution"][0], info["channels"]
    var_type = diff_cfg.get("model_var_type", "fixed-large")
    model = build_unet(
        model_cfg,
        channels,
        out_channels=2 * channels if var_type == "learned" else channels,
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
    )
    params = model.init(
        jax.random.key(0), jnp.zeros((1, res, res, channels)), jnp.zeros((1,), jnp.int32)
    )["params"]
    state = TrainState.create(params, make_optimizer(lr=1e-4), use_ema=True)
    state, epoch = load_checkpoint(state, chkpt)
    print(f"loaded checkpoint @ epoch {epoch} (step {int(state.step)})", flush=True)
    weights = (
        state.ema_params
        if (args.use_ema and state.ema_params is not None)
        else state.params
    )

    def denoise(x_t, t):
        return model.apply({"params": weights}, x_t, t, train=False)

    @jax.jit
    def bpd_batch(x, key):
        return diffusion.calc_all_bpd(
            denoise, x, key, clip_denoised=not args.no_clip_denoised
        )

    loader, _ = get_dataloader(
        dataset,
        args.batch_size,
        split=args.split,
        root=os.path.expanduser(args.root),
        raw=True,
        drop_last=True,
        random_seed=args.seed,
    )
    key = jax.random.key(args.seed)
    totals, priors, terms, mses = [], [], [], []
    seen = 0
    t0 = time.time()
    for batch in loader:
        x = np.asarray(batch, np.float32) / 127.5 - 1.0
        key, sub = jax.random.split(key)
        total_bpd, losses, prior_bpd, mse = bpd_batch(jnp.asarray(x), sub)
        totals.append(np.asarray(total_bpd))
        priors.append(np.asarray(prior_bpd))
        terms.append(np.asarray(losses))
        mses.append(np.asarray(mse))
        seen += len(x)
        print(
            f"{seen}/{args.num_examples} examples "
            f"(running total_bpd={np.concatenate(totals).mean():.4f})",
            flush=True,
        )
        if seen >= args.num_examples:
            break

    total = float(np.concatenate(totals).mean())
    prior = float(np.concatenate(priors).mean())
    term_means = np.concatenate(terms).mean(axis=0)  # (T,)
    mse_means = np.concatenate(mses).mean(axis=0)
    print(f"\n== bits/dim over {seen} held-out '{args.split}' examples "
          f"({time.time() - t0:.0f}s) ==")
    print(f"total_bpd: {total:.4f}   prior_bpd: {prior:.4f}   "
          f"sum(terms): {float(term_means.sum()):.4f}")
    print("per-term bpd by timestep decile (t ascending; term 0 = decoder NLL):")
    T = len(term_means)
    for lo in range(0, T, max(T // 10, 1)):
        hi = min(lo + max(T // 10, 1), T)
        # scientific notation: the VLB mass concentrates at small t, and
        # the mid/upper buckets are O(1e-6) bits — fixed-point %.5f printed
        # them as 0.00000, making the table blind to mid-t regressions
        print(f"  t[{lo:4d}:{hi:4d}]  bpd {term_means[lo:hi].mean():.3e}   "
              f"mse {mse_means[lo:hi].mean():.3e}")

    results = {
        "bpd": round(total, 4),
        "prior_bpd": round(prior, 4),
        "decoder_nll_bpd": round(float(term_means[0]), 4),
        "epoch": epoch,
        "use_ema": args.use_ema,
        "split": args.split,
        "n": seen,
    }
    with open("metrics.txt", "a") as f:
        f.write(f"{dataset} bpd {args.chkpt_path or chkpt}: {json.dumps(results)}\n")
    print(f"appended to metrics.txt: {results}")


if __name__ == "__main__":
    main()

"""Toy 2-D training CLI (reference: train_toy.py).

Trains the temporal MLP Decoder on gaussian8 / gaussian25 / swissroll with
the jitted train step, evaluates by 2-D histogram KLD, and saves sample
scatterplots per epoch.
"""

from __future__ import annotations

import os
from argparse import ArgumentParser

import jax
import jax.numpy as jnp
import numpy as np


def main():
    parser = ArgumentParser()
    parser.add_argument("--dataset", choices=["gaussian8", "gaussian25", "swissroll"],
                        default="gaussian8")
    parser.add_argument("--size", default=100000, type=int)
    parser.add_argument("--root", default="~/datasets", type=str)
    parser.add_argument("--epochs", default=100, type=int)
    parser.add_argument("--lr", default=0.001, type=float)
    parser.add_argument("--lr-warmup", default=0, type=int,
                        help="number of warming-up epochs (reference train_toy.py:21)")
    parser.add_argument("--beta1", default=0.9, type=float)
    parser.add_argument("--beta2", default=0.999, type=float)
    parser.add_argument("--batch-size", default=1000, type=int)
    parser.add_argument("--timesteps", default=100, type=int)
    parser.add_argument("--beta-schedule", default="linear",
                        choices=["quad", "linear", "warmup10", "warmup50", "const", "jsd"])
    parser.add_argument("--beta-start", default=0.001, type=float)
    parser.add_argument("--beta-end", default=0.2, type=float)
    parser.add_argument("--model-mean-type", choices=["mean", "x_0", "eps"], default="eps")
    parser.add_argument("--model-var-type", choices=["learned", "fixed-small", "fixed-large"],
                        default="fixed-large",
                        help="default matches the reference TOY default (train_toy.py:28), "
                             "which is fixed-large — unlike the image configs")
    parser.add_argument("--loss-type", choices=["kl", "mse"], default="mse")
    parser.add_argument("--grad-norm", default=0.0, type=float,
                        help="global-norm gradient clip; 0 disables it "
                             "(the reference toy trainer disables clipping, train_toy.py:99)")
    parser.add_argument("--resample", action="store_true",
                        help="redraw the toy dataset every epoch (the reference streams the "
                             "same size-point draw each epoch, toy_data.py:117/134)")
    parser.add_argument("--mid-features", default=128, type=int)
    parser.add_argument("--num-temporal-layers", default=3, type=int)
    parser.add_argument("--image-dir", default="./images/train_toy", type=str)
    parser.add_argument("--chkpt-dir", default="./chkpts/toy", type=str)
    parser.add_argument("--chkpt-intv", default=10, type=int)
    parser.add_argument("--eval-intv", default=10, type=int)
    parser.add_argument("--eval-size", default=30000, type=int)
    parser.add_argument("--seed", default=1234, type=int)
    parser.add_argument("--resume", action="store_true",
                        help="resume training from the latest checkpoint in --chkpt-dir "
                             "(note: the per-update LR warmup multiplier is quantized by "
                             "num_batches = --size // --batch-size, so resuming with a "
                             "different --size/--batch-size shifts the warmup schedule)")
    args = parser.parse_args()

    from ddpm_tpu.data.toy import TOY_DATASETS, DataStreamer
    from ddpm_tpu.diffusion.toy import ToyGaussianDiffusion
    from ddpm_tpu.math import get_beta_schedule
    from ddpm_tpu.metrics.toy import ToyEvaluator
    from ddpm_tpu.models import Decoder
    from ddpm_tpu.train import (
        TrainState,
        load_checkpoint,
        make_optimizer,
        make_sample_fn,
        make_train_step,
        save_checkpoint,
    )
    from ddpm_tpu.utils import seed_all
    from ddpm_tpu.utils.images import save_scatterplot

    seed_all(args.seed)
    num_batches = args.size // args.batch_size
    streamer = DataStreamer(args.dataset, args.batch_size, num_batches, resample=args.resample)

    betas = get_beta_schedule(args.beta_schedule, args.beta_start, args.beta_end, args.timesteps)
    diffusion = ToyGaussianDiffusion.create(
        betas, args.model_mean_type, args.model_var_type, args.loss_type
    )
    model = Decoder(
        in_features=2,
        mid_features=args.mid_features,
        num_temporal_layers=args.num_temporal_layers,
    )
    params = model.init(
        jax.random.key(args.seed), jnp.zeros((1, 2)), jnp.zeros((1,), jnp.int32)
    )["params"]
    # the reference steps its warmup LambdaLR once per EPOCH in the toy
    # trainer (toy_utils.py:92-93); warmup_stride quantizes the per-update
    # schedule to the same multiplier sequence
    tx = make_optimizer(
        lr=args.lr, grad_norm=args.grad_norm, warmup=args.lr_warmup,
        warmup_stride=num_batches, beta1=args.beta1, beta2=args.beta2,
    )
    state = TrainState.create(params, tx, use_ema=False)

    step = make_train_step(model.apply, diffusion)
    sample_fn = make_sample_fn(
        model.apply, diffusion, (args.eval_size, 2), use_ema=False, clip_denoised=False
    )
    evaluator = ToyEvaluator(
        TOY_DATASETS[args.dataset](args.eval_size, random_state=args.seed).data,
        total_size=args.eval_size,
        batch_size=args.eval_size,
    )

    os.makedirs(args.image_dir, exist_ok=True)
    os.makedirs(args.chkpt_dir, exist_ok=True)
    key = jax.random.key(args.seed)

    start_epoch = 0
    if args.resume:
        state, start_epoch = load_checkpoint(state, args.chkpt_dir)
        # keep BOTH RNG streams disjoint from the epochs already trained:
        # the JAX key drives t/noise draws, and numpy's global state drives
        # the DataStreamer's per-epoch resampling — without reseeding numpy
        # the resumed run would replay exactly the batches of epochs
        # 0..start_epoch-1
        key = jax.random.fold_in(key, start_epoch)
        seed_all(args.seed + start_epoch)
        print(f"resumed from epoch {start_epoch}", flush=True)

    for epoch in range(start_epoch, args.epochs):
        losses = []
        for batch in streamer:
            key, sub = jax.random.split(key)
            state, loss = step(state, jnp.asarray(batch), sub)
            losses.append(loss)
        # one stacked transfer, not one ~35 ms tunnel round trip per batch
        # (same fix as Trainer._drain_losses)
        print(
            f"epoch {epoch + 1}/{args.epochs} "
            f"loss={float(np.mean(np.asarray(jnp.stack(losses)))):.4f}",
            flush=True,
        )
        if (epoch + 1) % args.eval_intv == 0:
            key, sub = jax.random.split(key)
            samples = np.asarray(sample_fn(state, sub))
            result = evaluator.eval(lambda n, i: samples[:n])
            print(f"  kld={result['kld']:.4f}", flush=True)
            save_scatterplot(
                os.path.join(args.image_dir, f"{args.dataset}_{epoch + 1}.png"), samples
            )
        if (epoch + 1) % args.chkpt_intv == 0:
            save_checkpoint(state, args.chkpt_dir, epoch + 1)


if __name__ == "__main__":
    main()

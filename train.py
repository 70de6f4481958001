"""Training CLI — same flag surface & config-merge semantics as the
reference train.py, executed as a single SPMD program over all TPU chips.

Differences from the reference launcher model (ddpm_torch/train.py:236-301):
there is no mp.spawn / torchrun fork — JAX SPMD means one process per host
drives all local chips, and multi-host runs launch this same script once per
host (``--distributed`` runs jax.distributed.initialize for rendezvous;
the reference's ``--rigid-launch``/``--num-gpus`` spawn modes do not exist
since sharding is automatic over the mesh). ``--num-workers`` and
``--train-device``/``--eval-device`` have no TPU equivalent (in-process
loader with device prefetch; one backend), and ``--chkpt-name`` is subsumed
by the epoch-keyed checkpoint directory under ``--chkpt-dir/<exp-name>/``.
"""

from __future__ import annotations

import json
import os
import time
from argparse import ArgumentParser

import jax
import jax.numpy as jnp
import numpy as np


def main():
    parser = ArgumentParser()
    parser.add_argument("--config-path", type=str, help="path to the configuration file")
    parser.add_argument("--exp-name", type=str, help="name of the current experiment run")
    parser.add_argument("--dataset", default="cifar10")
    parser.add_argument("--root", default="~/datasets", type=str)
    parser.add_argument("--epochs", default=50, type=int)
    parser.add_argument("--lr", default=0.0002, type=float)
    parser.add_argument("--beta1", default=0.9, type=float)
    parser.add_argument("--beta2", default=0.999, type=float)
    parser.add_argument("--batch-size", default=128, type=int)
    parser.add_argument("--num-accum", default=1, type=int)
    parser.add_argument("--block-size", default=1, type=int)
    parser.add_argument("--timesteps", default=1000, type=int)
    parser.add_argument(
        "--beta-schedule",
        choices=["quad", "linear", "warmup10", "warmup50", "const", "jsd"],
        default="linear",
    )
    parser.add_argument("--beta-start", default=0.0001, type=float)
    parser.add_argument("--beta-end", default=0.02, type=float)
    parser.add_argument("--model-mean-type", choices=["mean", "x_0", "eps"], default="eps")
    parser.add_argument(
        "--model-var-type", choices=["learned", "fixed-small", "fixed-large"], default="fixed-large"
    )
    parser.add_argument(
        "--loss-type", choices=["kl", "mse", "hybrid"], default="mse",
        help="kl/mse are the reference objectives; hybrid (extension) is "
        "mse + 0.001*stop-grad-mean VLB, the Improved-DDPM recipe that "
        "actually trains a learned-variance head to sampling quality",
    )
    parser.add_argument("--image-dir", default="./images/train", type=str)
    parser.add_argument("--image-intv", default=10, type=int)
    parser.add_argument("--num-samples", default=64, type=int)
    parser.add_argument("--config-dir", default=None, type=str)
    parser.add_argument("--chkpt-dir", default="./chkpts", type=str)
    parser.add_argument("--chkpt-intv", default=120, type=int)
    parser.add_argument("--seed", default=1234, type=int)
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--chkpt-path", default="", type=str)
    parser.add_argument("--eval", action="store_true", help="evaluate FID during training")
    parser.add_argument("--eval-total-size", default=50000, type=int)
    parser.add_argument("--eval-batch-size", default=256, type=int)
    parser.add_argument("--use-ema", action="store_true")
    parser.add_argument("--use-ddim", action="store_true")
    parser.add_argument("--skip-schedule", choices=["linear", "quadratic"], default="linear")
    parser.add_argument("--subseq-size", default=50, type=int)
    parser.add_argument("--ema-decay", default=0.9999, type=float)
    parser.add_argument("--grad-norm", default=1.0, type=float)
    parser.add_argument("--warmup", default=5000, type=int)
    parser.add_argument("--train-split", default=None, type=str)
    parser.add_argument("--dry-run", action="store_true")
    parser.add_argument(
        "--device-cache", action="store_true",
        help="stage the whole in-memory uint8 dataset to HBM once and "
        "gather/flip batches ON DEVICE; per-step host->device traffic "
        "drops from the pixel batch to ~1 KB of indices (fastest input "
        "path, and sidesteps the axon per-transfer host-buffer leak — "
        "docs/performance.md round 4). In-memory datasets, plus disk "
        "datasets whose decoded uint8 array fits HBM (decoded once up "
        "front via FileDataset.materialize)",
    )
    parser.add_argument(
        "--distributed", action="store_true",
        help="multi-host SPMD: run jax.distributed.initialize() before "
        "anything touches the backend (launch this script once per host; "
        "replaces the reference's torchrun/mp.spawn paths)",
    )
    parser.add_argument("--bf16", action="store_true", help="bfloat16 compute (recommended on TPU)")
    parser.add_argument(
        "--remat", action="store_true",
        help="per-block rematerialization: trade recompute FLOPs for "
        "activation HBM (not needed for any bundled config at its "
        "single-chip batch; celebahq b32 is ~17%% faster without it)",
    )
    parser.add_argument(
        "--fuse-conv-gn", action="store_true",
        help="fuse each residual block's conv1 with norm2's statistics via "
        "the implicit-GEMM Pallas conv (ops/pallas/conv_gn.py): the conv "
        "epilogue emits the GN sums, so the pre-norm activation is never "
        "re-read (A/B numbers in docs/performance.md)",
    )
    args = parser.parse_args()
    train(args)


def train(args):
    from ddpm_tpu import (
        DATASET_INFO,
        GaussianDiffusion,
        build_unet,
        get_beta_schedule,
        get_dataloader,
        get_param,
        resolve_config,
        seed_all,
    )
    from ddpm_tpu.parallel import init_distributed, make_mesh
    from ddpm_tpu.train import TrainState, make_optimizer
    from ddpm_tpu.train.trainer import Trainer
    from ddpm_tpu.utils import dict2str

    # must precede any backend-initializing jax call (process_index below)
    init_distributed(force=getattr(args, "distributed", False))

    seed_all(args.seed)
    is_leader = jax.process_index() == 0

    def logger(msg):
        if is_leader:
            print(msg, flush=True)

    # --- config merge: file section first, CLI fallback (train.py:41-55) ---
    config = resolve_config(
        args.dataset, args.config_path, args.config_dir, logger=logger
    )
    dataset = (config or {}).get("dataset", args.dataset)
    diff_cfg = (config or {}).get("diffusion") or {}
    model_cfg = (config or {}).get("model") or {}
    train_cfg = (config or {}).get("train") or {}

    timesteps = get_param("timesteps", diff_cfg, args)
    betas = get_beta_schedule(
        get_param("beta_schedule", diff_cfg, args),
        get_param("beta_start", diff_cfg, args),
        get_param("beta_end", diff_cfg, args),
        timesteps,
    )
    diffusion = GaussianDiffusion.create(
        betas,
        model_mean_type=get_param("model_mean_type", diff_cfg, args),
        model_var_type=get_param("model_var_type", diff_cfg, args),
        loss_type=get_param("loss_type", diff_cfg, args),
    )

    if dataset not in DATASET_INFO:
        raise SystemExit(
            f"error: unknown dataset {dataset!r}; available: {sorted(DATASET_INFO)}"
        )
    info = DATASET_INFO[dataset]
    res = info["resolution"][0]
    channels = info["channels"]
    # learned variance: the head emits 2C channels (mean-param + logvar
    # interpolation fraction), reference train.py:63
    out_channels = 2 * channels if diffusion.model_var_type == "learned" else channels
    model = build_unet(
        model_cfg,
        channels,
        out_channels=out_channels,
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
        block_size=args.block_size,
        remat=args.remat,
        fuse_conv_gn=getattr(args, "fuse_conv_gn", False),
    )

    batch_size = get_param("batch_size", train_cfg, args)
    epochs = get_param("epochs", train_cfg, args)
    lr = get_param("lr", train_cfg, args)
    grad_norm = get_param("grad_norm", train_cfg, args)
    warmup = get_param("warmup", train_cfg, args, default=args.warmup)
    use_ema = train_cfg.get("use_ema", args.use_ema)
    ema_decay = get_param("ema_decay", train_cfg, args)

    # per-update microbatch: config batch is divided by num_accum
    # (reference train.py:46)
    micro_batch = batch_size // args.num_accum

    split = args.train_split or ("all" if dataset.startswith("celeba") else "train")
    trainloader, _ = get_dataloader(
        dataset,
        micro_batch,
        split=split,
        random_seed=args.seed,
        root=os.path.expanduser(args.root),
        drop_last=True,
        num_shards=jax.process_count(),
        shard_index=jax.process_index(),
        # ship uint8 and normalize inside the jitted step: 4x less
        # host->device transfer per batch
        device_normalize=True,
        yield_indices=getattr(args, "device_cache", False),
    )

    x = jnp.zeros((1, res, res, channels), jnp.float32)
    t0 = jnp.zeros((1,), jnp.int32)
    params = model.init(jax.random.key(args.seed), x, t0)["params"]
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    logger(f"model parameters: {n_params / 1e6:.2f}M; devices: {jax.device_count()}")

    tx = make_optimizer(
        lr=lr, grad_norm=grad_norm, warmup=warmup, beta1=args.beta1, beta2=args.beta2
    )
    state = TrainState.create(
        params, tx, ema_decay=ema_decay, use_ema=use_ema, num_accum=args.num_accum
    )

    mesh = make_mesh()
    exp_name = args.exp_name or f"ddpm_{dataset}"
    chkpt_dir = os.path.join(args.chkpt_dir, exp_name)
    image_dir = os.path.join(args.image_dir, exp_name)

    # archive run hyperparameters (reference train.py:156-171)
    if is_leader:
        os.makedirs(chkpt_dir, exist_ok=True)
        hps = {
            "dataset": dataset,
            "diffusion": dict(diff_cfg),
            "model": dict(model_cfg),
            "train": {
                "lr": lr, "batch_size": batch_size, "epochs": epochs,
                "warmup": warmup, "grad_norm": grad_norm, "use_ema": use_ema,
                "ema_decay": ema_decay, "num_accum": args.num_accum,
            },
        }
        ts = time.strftime("%Y-%m-%dT%H%M%S")
        with open(os.path.join(chkpt_dir, f"exp_{ts}.info"), "w") as f:
            json.dump(hps, f, indent=2)
        logger(dict2str(hps))

    sampler_diffusion = diffusion
    if args.use_ddim:
        from ddpm_tpu import ddim_from_betas, get_selection_schedule

        subsequence = get_selection_schedule(args.skip_schedule, args.subseq_size, timesteps)
        sampler_diffusion = ddim_from_betas(
            betas,
            diffusion.model_mean_type,
            diffusion.model_var_type,
            diffusion.loss_type,
            eta=0.0,
            subsequence=subsequence,
        )
        # (a learned-variance model is sampled through this fixed-small
        # DDIM via p_mean_var's shape-driven eps-half slice)

    trainer = Trainer(
        model=model,
        diffusion=diffusion,
        sampler_diffusion=sampler_diffusion,
        state=state,
        trainloader=trainloader,
        epochs=epochs,
        mesh=mesh,
        sample_size=args.num_samples,
        sample_shape=(res, res, channels),
        image_intv=args.image_intv,
        chkpt_intv=args.chkpt_intv,
        seed=args.seed,
        dry_run=args.dry_run,
        logger=logger,
    )
    evaluator = None
    if args.eval:
        from ddpm_tpu.metrics import (
            INCEPTION_WEIGHTS,
            Evaluator,
            load_inception_variables,
        )

        try:
            inception_vars = load_inception_variables(INCEPTION_WEIGHTS)
        except FileNotFoundError as e:
            # same graceful exit as eval.py: the reference downloads the FID
            # Inception weights on demand (inception.py:13); offline hosts
            # must convert them once with scripts/convert_inception.py.
            # Only the weight load maps to this message — dataset errors
            # from the stats fallback propagate with their own context.
            raise SystemExit(f"error: --eval needs FID weights: {e}")
        evaluator = Evaluator(
            dataset=dataset,
            total_size=args.eval_total_size,
            batch_size=args.eval_batch_size,
            root=os.path.expanduser(args.root),
            variables=inception_vars,
        )

    # under multi-process SPMD, force resume so elastically-restarted workers
    # reload the last checkpoint (reference train.py:215-224)
    resume = args.resume or jax.process_count() > 1
    if resume or args.chkpt_path:
        try:
            trainer.load_checkpoint(args.chkpt_path or chkpt_dir)
        except FileNotFoundError:
            logger("no checkpoint found; starting fresh")

    trainer.train(evaluator=evaluator, chkpt_dir=chkpt_dir, image_dir=image_dir)


if __name__ == "__main__":
    main()

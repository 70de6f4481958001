"""Bulk generation CLI (reference: generate.py).

Loads a trained checkpoint and generates ``--total-size`` images as PNGs via
the on-device lax.scan sampler (DDPM or eta-parameterized DDIM). Where the
reference forks one process per GPU (generate.py:168-172), this is one SPMD
program: the batch axis is sharded over the TPU mesh, and PNG encoding runs
in a thread pool overlapping the next device batch.
"""

from __future__ import annotations

import math
import os
import uuid
from argparse import ArgumentParser, BooleanOptionalAction
from concurrent.futures import ThreadPoolExecutor

import jax
import jax.numpy as jnp
import numpy as np


def main():
    parser = ArgumentParser()
    parser.add_argument("--config-path", type=str)
    parser.add_argument("--dataset", default="cifar10")
    parser.add_argument("--batch-size", default=128, type=int)
    parser.add_argument("--total-size", default=50000, type=int)
    parser.add_argument("--config-dir", default=None, type=str)
    parser.add_argument("--chkpt-dir", default="./chkpts", type=str)
    parser.add_argument("--chkpt-path", default="", type=str)
    parser.add_argument(
        "--params-npz", default="", type=str,
        help="load model weights from a converted reference checkpoint "
        "(scripts/convert_checkpoint.py output) instead of an Orbax "
        "checkpoint dir — the FID-parity-gate path",
    )
    parser.add_argument("--save-dir", default="./images/eval", type=str)
    parser.add_argument("--use-ema", action="store_true")
    parser.add_argument("--use-ddim", action="store_true")
    parser.add_argument("--eta", default=0.0, type=float)
    parser.add_argument("--skip-schedule", default="linear", type=str)
    parser.add_argument("--subseq-size", default=50, type=int)
    parser.add_argument("--suffix", default="", type=str)
    parser.add_argument("--max-workers", default=8, type=int)
    parser.add_argument("--seed", default=1234, type=int)
    parser.add_argument("--bf16", action="store_true")
    parser.add_argument(
        "--progressive", action="store_true",
        help="also save pred_x0 snapshot grids every --pred-freq steps "
        "(denoise-animation frames; reference diffusion.py:176-198)",
    )
    parser.add_argument("--pred-freq", default=50, type=int)
    parser.add_argument(
        "--fuse-level", action=BooleanOptionalAction, default=True,
        help="run every same-channel ResBlock->AttentionBlock pair as one "
        "Pallas program (ops/pallas/level_fuse.py): eval-mode sampling "
        "fusion, ON by default since round 5 — the kernel self-gates to "
        "its validated envelope (16x16 levels, C%%128==0, VMEM fit) and "
        "falls back elsewhere, measured 1.02-1.18x and never worse on "
        "qualifying chains; checkpoints are interchangeable with the "
        "default path (A/B numbers in docs/performance.md). "
        "--no-fuse-level restores the pure-XLA path",
    )
    parser.add_argument(
        "--distributed", action="store_true",
        help="multi-host SPMD generation: one launch per host, each writes "
        "only its own shard (replaces reference mp.spawn, generate.py:168-172)",
    )
    args = parser.parse_args()

    from ddpm_tpu import (
        DATASET_INFO,
        GaussianDiffusion,
        build_unet,
        ddim_from_betas,
        get_beta_schedule,
        get_selection_schedule,
        resolve_config,
    )
    from ddpm_tpu.data.transforms import to_uint8
    from ddpm_tpu.parallel import addressable_rows, init_distributed, make_mesh
    from ddpm_tpu.train import TrainState, load_checkpoint, make_optimizer, make_sample_fn

    init_distributed(force=args.distributed)

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
    mean_type = diff_cfg.get("model_mean_type", "eps")
    var_type = diff_cfg.get("model_var_type", "fixed-large")
    if args.use_ddim:
        subsequence = get_selection_schedule(args.skip_schedule, args.subseq_size, timesteps)
        diffusion = ddim_from_betas(
            betas, mean_type, var_type, diff_cfg.get("loss_type", "mse"),
            eta=args.eta, subsequence=subsequence,
        )
    else:
        diffusion = GaussianDiffusion.create(
            betas, mean_type, var_type, diff_cfg.get("loss_type", "mse")
        )

    # fail fast on a missing checkpoint BEFORE the (expensive) model build
    chkpt = None
    if args.params_npz:
        if not os.path.exists(args.params_npz):
            raise SystemExit(f"error: params npz not found: {args.params_npz!r}")
    else:
        from ddpm_tpu.train.checkpoint import latest_epoch, resolve_checkpoint

        chkpt = args.chkpt_path or os.path.join(args.chkpt_dir, f"ddpm_{dataset}")
        chkpt_run, chkpt_epoch = resolve_checkpoint(chkpt)
        if chkpt_epoch is None and latest_epoch(chkpt_run) is None:
            raise SystemExit(f"error: no checkpoint found under {chkpt!r}")

    info = DATASET_INFO[dataset]
    res, channels = info["resolution"][0], info["channels"]
    # learned-variance checkpoints carry a 2C-channel head; rebuild it the
    # same way train.py did (the reference's generate.py:61 pins
    # out_channels=in_channels and so cannot reload its own learned-var
    # models — deliberate divergence)
    model = build_unet(
        model_cfg,
        channels,
        out_channels=2 * channels if var_type == "learned" else channels,
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
        fuse_level=getattr(args, "fuse_level", False),
    )

    params = model.init(
        jax.random.key(0), jnp.zeros((1, res, res, channels)), jnp.zeros((1,), jnp.int32)
    )["params"]
    tx = make_optimizer(lr=1e-4)
    state = TrainState.create(params, tx, use_ema=True)
    if args.params_npz:
        # converted reference weights: install as BOTH live and EMA params so
        # --use-ema and plain sampling read the same tree (the converter
        # already selected ema.shadow vs model via its --use-ema flag)
        from flax.traverse_util import unflatten_dict

        data = np.load(args.params_npz)
        loaded = unflatten_dict({tuple(k.split("/")): data[k] for k in data.files})
        # structure AND leaf shapes: a same-named tree from a different
        # hid_channels/ch_multipliers has identical structure, so shapes are
        # the check that actually catches a wrong --config at conversion
        if jax.tree.structure(loaded) != jax.tree.structure(params) or any(
            np.shape(a) != np.shape(p)
            for a, p in zip(jax.tree.leaves(loaded), jax.tree.leaves(params))
        ):
            raise SystemExit(
                f"error: {args.params_npz!r} does not match the "
                f"'{dataset}' model config (wrong --config at conversion?)"
            )
        loaded = jax.tree.map(lambda a, p: jnp.asarray(a, p.dtype), loaded, params)
        state = state.replace(params=loaded, ema_params=loaded)
        print(f"loaded converted params from {args.params_npz}")
    else:
        state, epoch = load_checkpoint(state, chkpt)
        print(f"loaded checkpoint @ epoch {epoch} (step {int(state.step)})")

    mesh = make_mesh()
    # NB a learned-variance (2C-head) checkpoint sampled through a
    # fixed-variance process (--use-ddim forces fixed-small) just works:
    # p_mean_var slices the eps half shape-wise (diffusion/gaussian.py)
    sample_fn = make_sample_fn(
        model.apply, diffusion, (args.batch_size, res, res, channels),
        use_ema=args.use_ema, mesh=mesh,
    )

    save_dir = os.path.join(args.save_dir, dataset + (f"_{args.suffix}" if args.suffix else ""))
    os.makedirs(save_dir, exist_ok=True)

    from PIL import Image

    def save_png(img_u8):
        im = Image.fromarray(img_u8.squeeze(-1) if img_u8.shape[-1] == 1 else img_u8)
        im.save(os.path.join(save_dir, f"{uuid.uuid4()}.png"))

    if args.progressive:
        # one jitted progressive chain; saves a grid per pred_x0 snapshot
        from ddpm_tpu.utils.images import save_image_grid

        def prog(state, key):
            params = (
                state.ema_params
                if (args.use_ema and state.ema_params is not None)
                else state.params
            )

            def denoise(x_t, t):
                return model.apply({"params": params}, x_t, t, train=False)

            return diffusion.p_sample_progressive(
                denoise, (args.batch_size, res, res, channels), key,
                pred_freq=args.pred_freq,
            )

        x0, preds = jax.jit(prog)(state, jax.random.key(args.seed))
        frames_dir = os.path.join(save_dir, "progressive")
        os.makedirs(frames_dir, exist_ok=True)
        preds = np.asarray(preds)  # (L, B, H, W, C), cleanest first
        # write noisiest as frame_0000 so the animation plays noise -> image
        for i, frame in enumerate(preds[::-1]):
            save_image_grid(os.path.join(frames_dir, f"frame_{i:04d}.png"), frame)
        save_image_grid(os.path.join(frames_dir, "final.png"), np.asarray(x0))
        print(f"wrote {len(preds)} progressive frames to {frames_dir}")
        return

    # uint8 conversion: multithreaded C++ kernel when built, numpy otherwise
    from ddpm_tpu import native

    convert_u8 = native.float_to_uint8 if native.available() else to_uint8

    key = jax.random.key(args.seed)
    num_batches = math.ceil(args.total_size / args.batch_size)
    written = 0
    # One-batch software pipeline: dispatch sampling for batch i+1 (JAX async
    # dispatch returns immediately) BEFORE fetching batch i, so the chip runs
    # the next chain while this host core converts + PNG-encodes the previous
    # one. The reference gets this overlap from separate writer threads per
    # GPU process (generate.py:113-130); here one dispatch reorder buys it.
    with ThreadPoolExecutor(max_workers=args.max_workers) as pool:
        def drain(batch):
            nonlocal written
            # multi-host: each process writes only the rows its devices
            # own (rank-sharded generation, reference generate.py:105-110)
            local = addressable_rows(*batch)
            list(pool.map(save_png, convert_u8(local)))
            written += batch[1]
            print(f"{written}/{args.total_size}", flush=True)

        pending = None  # (device array, rows to keep)
        for i in range(num_batches):
            key, sub = jax.random.split(key)
            x = sample_fn(state, sub)
            n = min(args.batch_size, args.total_size - i * args.batch_size)
            if pending is not None:
                drain(pending)
            pending = (x, n)
        if pending is not None:
            drain(pending)
    print(f"wrote {written} PNGs to {save_dir}")


if __name__ == "__main__":
    main()

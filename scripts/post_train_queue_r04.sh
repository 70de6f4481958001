#!/bin/sh
# Round-4 post-training chip queue: run AFTER the blobs64 flagship finishes.
# One chip client at a time (see verify skill gotchas) — strictly sequential;
# each step logs to logs/ and failures don't block the rest.
set -x
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
export INCEPTION_NPZ="$HOME/.cache/ddpm_tpu/standin_fid_inception_v3.npz"

EPOCH=$(ls chkpts/ddpm_blobs64 2>/dev/null | grep -E '^[0-9]+$' | sort -n | tail -1)

# 1. offline user workflow on the trained disk-dataset checkpoint:
#    generate 10k EMA DDIM-50 samples -> eval.py FID+PR (must reproduce the
#    in-loop trajectory's endpoint)
timeout 3000 python -u generate.py --dataset blobs64 \
  --chkpt-path "chkpts/ddpm_blobs64/$EPOCH" --use-ema --use-ddim \
  --subseq-size 50 --total-size 10000 --batch-size 128 --bf16 \
  --save-dir ./images/eval_r04 > logs/blobs64_generate.log 2>&1 || true
timeout 3000 python -u eval.py --dataset blobs64 \
  --sample-folder ./images/eval_r04/blobs64 --eval-total-size 10000 \
  --batch-size 128 > logs/blobs64_eval.log 2>&1 || true

# 2. the full bench_all sweep: every workload with its MFU column
timeout 5400 python -u scripts/bench_all.py > logs/bench_all_r04.log 2>&1 || true

# 3. whole-level fused kernel A/B: unit chains at both attention shapes,
#    then the end-to-end celeba-arch DDIM-50 sampler
{
  timeout 1200 python -u scripts/bench_level_fuse.py --hw 16 --ch 256
  timeout 1200 python -u scripts/bench_level_fuse.py --hw 8 --ch 256
  timeout 2400 python -u scripts/bench_level_fuse.py --sampler --iters 3
} > logs/level_fuse_ab.log 2>&1 || true

# 4. bits/dim on trained checkpoints (full-chain calc_all_bpd)
timeout 1800 python -u scripts/eval_bpd.py --dataset blobs \
  --chkpt-path chkpts/blobs_flagship/80 --use-ema --num-examples 256 \
  --batch-size 64 --bf16 > logs/bpd_blobs.log 2>&1 || true
timeout 1800 python -u scripts/eval_bpd.py --dataset blobs64 \
  --chkpt-path "chkpts/ddpm_blobs64/$EPOCH" --use-ema --num-examples 256 \
  --batch-size 64 --bf16 > logs/bpd_blobs64.log 2>&1 || true

# 5. short learned-variance image run: 2C head + kl loss trains without NaNs
timeout 2400 python -u train.py --dataset blobs --epochs 3 --batch-size 128 \
  --model-var-type learned --loss-type kl --use-ema --bf16 \
  --chkpt-intv 1000 --image-intv 1000 \
  --chkpt-dir /tmp/lv/chkpts --image-dir /tmp/lv/images \
  > logs/learnedvar_blobs.log 2>&1 || true

# 6. fresh headline numbers (pure step + sustained) for the README refresh
timeout 2400 python -u bench.py > logs/bench_r04_final.log 2>&1 || true

echo "QUEUE DONE" >> logs/post_queue_r04.status

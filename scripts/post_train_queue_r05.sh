#!/bin/sh
# Round-5 post-training chip queue: run AFTER the blobs256 flagship segment
# finishes (or is trimmed at a checkpoint). One chip client at a time (see
# verify skill gotchas) — strictly sequential; each step logs to logs/ and
# failures don't block the rest. Ordered most-important-first so a
# round-end cutoff costs the least.
set -x
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
export INCEPTION_NPZ="$HOME/.cache/ddpm_tpu/standin_fid_inception_v3.npz"

EPOCH=$(ls chkpts/ddpm_blobs256 2>/dev/null | grep -E '^[0-9]+$' | sort -n | tail -1)
HYB=$(ls chkpts/ddpm_blobs_hybrid 2>/dev/null | grep -E '^[0-9]+$' | sort -n | tail -1)
KLE=$(ls chkpts/ddpm_blobs_learned 2>/dev/null | grep -E '^[0-9]+$' | sort -n | tail -1)

# 1. offline user workflow on the trained HQ-shape checkpoint: generate 2500
#    EMA DDIM-50 samples at 256^2 -> eval.py FID (must reproduce the in-loop
#    trajectory's endpoint)
timeout 5000 python -u generate.py --dataset blobs256 \
  --chkpt-path "chkpts/ddpm_blobs256/$EPOCH" --use-ema --use-ddim \
  --subseq-size 50 --total-size 2500 --batch-size 64 --bf16 \
  --save-dir ./images/eval_r05 > logs/blobs256_generate.log 2>&1 || true
timeout 5000 python -u eval.py --dataset blobs256 \
  --sample-folder ./images/eval_r05/blobs256 --eval-total-size 2500 \
  --batch-size 64 > logs/blobs256_eval.log 2>&1 || true

# 2. learned-variance A/B artifacts (kl vs hybrid, both 2C-head models):
#    offline generate->eval for the hybrid model (DDIM-50 eps-head path and
#    a DDPM-1000 learned-logvar ancestral batch).
timeout 3000 python -u generate.py --dataset blobs --config-path blobs_hybrid \
  --chkpt-path "chkpts/ddpm_blobs_hybrid/$HYB" --use-ema --use-ddim \
  --subseq-size 50 --total-size 10000 --batch-size 125 --bf16 \
  --save-dir ./images/eval_r05_hybrid > logs/hybrid_generate.log 2>&1 || true
timeout 3000 python -u eval.py --dataset blobs \
  --sample-folder ./images/eval_r05_hybrid/blobs --eval-total-size 10000 \
  --batch-size 125 > logs/hybrid_eval.log 2>&1 || true
timeout 1800 python -u generate.py --dataset blobs --config-path blobs_hybrid \
  --chkpt-path "chkpts/ddpm_blobs_hybrid/$HYB" --use-ema \
  --total-size 625 --batch-size 125 --bf16 \
  --save-dir ./images/eval_r05_hybrid_ddpm > logs/hybrid_generate_ddpm.log 2>&1 || true

# 3. level-fuse sampler A/B beyond the celeba arch (VERDICT r4 weak-1):
#    CIFAR DDIM-50 and DDPM-1000 chains, then the celeba re-run for the table
{
  timeout 2400 python -u scripts/bench_level_fuse.py --sampler --sampler-config cifar10 --iters 4
  timeout 2400 python -u scripts/bench_level_fuse.py --sampler --sampler-config cifar10 --ddpm --iters 1
  timeout 2400 python -u scripts/bench_level_fuse.py --sampler --sampler-config celeba --iters 3
} > logs/level_fuse_ab_r05.log 2>&1 || true

# 4. bits/dim rows: HQ-shape checkpoint + both learned-variance models
timeout 3600 python -u scripts/eval_bpd.py --dataset blobs256 \
  --chkpt-path "chkpts/ddpm_blobs256/$EPOCH" --use-ema --num-examples 64 \
  --batch-size 16 --bf16 > logs/bpd_blobs256.log 2>&1 || true
timeout 1800 python -u scripts/eval_bpd.py --dataset blobs --config-path blobs_hybrid \
  --chkpt-path "chkpts/ddpm_blobs_hybrid/$HYB" --use-ema --num-examples 256 \
  --batch-size 64 --bf16 > logs/bpd_blobs_hybrid.log 2>&1 || true
timeout 1800 python -u scripts/eval_bpd.py --dataset blobs --config-path blobs_learned \
  --chkpt-path "chkpts/ddpm_blobs_learned/$KLE" --use-ema --num-examples 256 \
  --batch-size 64 --bf16 > logs/bpd_blobs_kl.log 2>&1 || true

# 5. headline numbers: train step + sustained + the sampling north star
timeout 2400 python -u bench.py > logs/bench_r05.log 2>&1 || true

echo "QUEUE DONE" >> logs/post_queue_r05.status

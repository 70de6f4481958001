#!/bin/bash
# Turnkey released-checkpoint FID parity gate (north star in BASELINE.json).
#
#   scripts/parity_gate.sh <reference_checkpoint.pt> [dataset]
#
# Pipeline: convert the reference torch checkpoint -> generate TOTAL_SIZE
# images at DDIM-SUBSEQ_SIZE (eta 0, EMA weights) -> compute FID against the
# dataset statistics -> compare with the reference README's experiment table
# (README.md:323-425). Matches the reference's own evaluation protocol:
# 50k samples, pytorch-fid InceptionV3 statistics.
#
# Prerequisites (one-time, artifacts are not bundled in this repo):
#   * the released checkpoint, e.g. cifar10_2040.pt   (README.md:363)
#   * FID InceptionV3 weights npz at ~/.cache/ddpm_tpu/fid_inception_v3.npz
#     - produced by: python scripts/convert_inception.py --pt pt_inception-2015-12-05-6726825d.pth
#   * the real dataset under DATA_ROOT (for the FID reference statistics;
#     computed once and cached to precomputed/fid_stats_<dataset>.npz)
#
# Env knobs: TOTAL_SIZE (50000), BATCH_SIZE (500), SUBSEQ_SIZE (50), ETA (0),
#            WORK_DIR (/tmp/parity_gate), DATA_ROOT (~/datasets), EXTRA_GEN
#            (extra generate.py flags, e.g. "--bf16").
#
# Dress rehearsal (no artifacts needed): scripts/rehearse_parity_gate.sh runs
# this same script end-to-end on synthetic weights + FakeData.
set -euo pipefail

CHKPT="${1:?usage: scripts/parity_gate.sh <reference_checkpoint.pt> [dataset]}"
DATASET="${2:-}"
TOTAL_SIZE="${TOTAL_SIZE:-50000}"
BATCH_SIZE="${BATCH_SIZE:-500}"
SUBSEQ_SIZE="${SUBSEQ_SIZE:-50}"
ETA="${ETA:-0}"
WORK_DIR="${WORK_DIR:-/tmp/parity_gate}"
DATA_ROOT="${DATA_ROOT:-$HOME/datasets}"
PRECOMPUTED_DIR="${PRECOMPUTED_DIR:-precomputed}"
EXTRA_GEN="${EXTRA_GEN:-}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"

if [ -z "$DATASET" ]; then
  case "$(basename "$CHKPT")" in
    cifar10*) DATASET=cifar10 ;;
    celebahq*) DATASET=celebahq ;;
    celeba*) DATASET=celeba ;;
    mnist*) DATASET=mnist ;;
    *) echo "error: cannot infer dataset from $(basename "$CHKPT"); pass it as arg 2" >&2
       exit 2 ;;
  esac
fi

INCEPTION_NPZ="${INCEPTION_NPZ:-$HOME/.cache/ddpm_tpu/fid_inception_v3.npz}"
if [ ! -f "$INCEPTION_NPZ" ]; then
  echo "error: FID InceptionV3 weights missing at $INCEPTION_NPZ" >&2
  echo "  obtain pt_inception-2015-12-05-6726825d.pth (reference inception.py:13)" >&2
  echo "  and run: python scripts/convert_inception.py --pt <path-to.pth>" >&2
  exit 2
fi

mkdir -p "$WORK_DIR"
STAMP="$(basename "$CHKPT" .pt)"
NPZ="$WORK_DIR/${STAMP}_ema.npz"
SAMPLES="$WORK_DIR/samples_${STAMP}_ddim${SUBSEQ_SIZE}"

echo "== [1/3] convert $CHKPT (EMA weights) -> $NPZ"
python scripts/convert_checkpoint.py --chkpt "$CHKPT" --config "$DATASET" \
  --use-ema --out "$NPZ"

echo "== [2/3] generate $TOTAL_SIZE images @ DDIM-$SUBSEQ_SIZE eta=$ETA"
# shellcheck disable=SC2086
python generate.py --dataset "$DATASET" --params-npz "$NPZ" --use-ema \
  --use-ddim --subseq-size "$SUBSEQ_SIZE" --eta "$ETA" \
  --total-size "$TOTAL_SIZE" --batch-size "$BATCH_SIZE" \
  --save-dir "$SAMPLES" $EXTRA_GEN

echo "== [3/3] FID over $SAMPLES/$DATASET"
python eval.py --dataset "$DATASET" --root "$DATA_ROOT" \
  --sample-folder "$SAMPLES/$DATASET" --eval-total-size "$TOTAL_SIZE" \
  --metrics fid --precomputed-dir "$PRECOMPUTED_DIR" | tee "$WORK_DIR/${STAMP}_fid.log"

# '[0-9.a-z-]' keeps nan/inf/-0.0 matchable: under set -e a no-match grep
# would otherwise kill the gate silently AFTER the expensive 50k generation
FID="$(grep -oE 'fid: [0-9.a-z-]+' "$WORK_DIR/${STAMP}_fid.log" | awk '{print $2}' | tail -1)"
if [ -z "$FID" ]; then
  echo "ERROR: eval.py printed no FID (see $WORK_DIR/${STAMP}_fid.log)" >&2
  exit 1
fi
case "$FID" in
  nan|inf|-inf)
    echo "ERROR: degenerate FID '$FID' — stats/weights mismatch? (see $WORK_DIR/${STAMP}_fid.log)" >&2
    exit 1 ;;
esac

# Reference README experiment table, 1000-step DDPM FIDs for the released
# checkpoints (README.md:363,389,424). DDIM-50/eta0 typically lands within
# ~0.5 of the 1000-step number on these models; the gate passes within
# PASS_TOL (default 1.0) of the table row.
case "$DATASET" in
  cifar10) REF_FID=3.188 ;;
  celeba) REF_FID=2.995 ;;
  celebahq) REF_FID=8.851 ;;
  *) REF_FID="" ;;
esac
PASS_TOL="${PASS_TOL:-1.0}"

echo "== parity gate result"
echo "   checkpoint: $CHKPT"
echo "   sampler:    DDIM-$SUBSEQ_SIZE eta=$ETA, $TOTAL_SIZE samples"
echo "   fid:        $FID"
if [ -n "$REF_FID" ]; then
  echo "   reference:  $REF_FID (1000-step DDPM, README experiment table)"
  python - "$FID" "$REF_FID" "$PASS_TOL" <<'EOF'
import sys
fid, ref, tol = map(float, sys.argv[1:4])
ok = abs(fid - ref) <= tol
print(f"   |fid - ref| = {abs(fid - ref):.3f} {'<=' if ok else '>'} {tol} -> "
      f"{'PASS' if ok else 'FAIL'}")
sys.exit(0 if ok else 1)
EOF
else
  echo "   (no reference table row for $DATASET; inspect FID manually)"
fi

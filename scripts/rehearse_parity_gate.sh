#!/bin/bash
# Dress rehearsal of the released-checkpoint FID parity gate, fully offline.
#
#   scripts/rehearse_parity_gate.sh
#
# Fabricates seeded stand-ins for the three external artifacts (reference
# checkpoint .pt, FID Inception weights, CIFAR-10 on disk) and then runs the
# REAL gate script on them at full batch shapes. The FID value that comes out
# is meaningless (random weights); what this proves is that every seam of
# scripts/parity_gate.sh — torch checkpoint parse incl. ema.shadow +
# "module." strip, NCHW->NHWC conversion, --params-npz generation at DDIM-50,
# raw-dataset FID statistics, Frechet distance — runs end to end, so when
# the real artifacts appear the gate is one command away.
#
# Env knobs: TOTAL_SIZE (1024), BATCH_SIZE (512), WORK (/tmp/parity_rehearsal)
set -euo pipefail

WORK="${WORK:-/tmp/parity_rehearsal}"
TOTAL_SIZE="${TOTAL_SIZE:-1024}"
BATCH_SIZE="${BATCH_SIZE:-512}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"

mkdir -p "$WORK"
# check every artifact incl. the dataset dir (fabricated LAST — a run
# interrupted mid-fabrication must not take the reuse branch)
if [ -f "$WORK/artifacts/cifar10_rehearsal.pt" ] && \
   [ -f "$WORK/artifacts/fid_inception_v3.npz" ] && \
   [ -f "$WORK/artifacts/datasets/cifar-10-batches-py/data_batch_1" ]; then
  echo "== rehearsal: reusing artifacts under $WORK/artifacts"
else
  echo "== rehearsal: fabricating artifacts under $WORK/artifacts"
  python scripts/make_rehearsal_artifacts.py --out-dir "$WORK/artifacts" \
    --cifar-per-batch 512
fi

echo "== rehearsal: running the real gate (FID value will be meaningless)"
INCEPTION_NPZ="$WORK/artifacts/fid_inception_v3.npz" \
DATA_ROOT="$WORK/artifacts/datasets" \
WORK_DIR="$WORK/gate" \
PRECOMPUTED_DIR="$WORK/precomputed" \
TOTAL_SIZE="$TOTAL_SIZE" \
BATCH_SIZE="$BATCH_SIZE" \
PASS_TOL=1e9 \
EXTRA_GEN="--bf16" \
  scripts/parity_gate.sh "$WORK/artifacts/cifar10_rehearsal.pt" cifar10

# The stand-in Inception (He-normal kernels) produces live, discriminating
# features — so the FID between the random-UNet samples and the synthetic
# dataset must be a finite, strictly positive distance. 0.0 or nan here
# means the feature pipeline or the Frechet math is broken.
FID="$(grep -oE 'fid: [0-9.a-z]+' "$WORK/gate/"*_fid.log | awk '{print $2}' | tail -1)"
python - "$FID" <<'EOF'
import math, sys
fid = float(sys.argv[1])
assert math.isfinite(fid) and fid > 0.01, f"rehearsal FID not a real distance: {fid}"
print(f"rehearsal FID sanity: {fid:.3f} (finite, nonzero) OK")
EOF

echo "== rehearsal complete: pipeline exercised end-to-end (PASS above is the"
echo "   PASS_TOL=1e9 mechanical check only; the FID number itself is random-"
echo "   weights noise). Real gate: scripts/parity_gate.sh <released.pt>"

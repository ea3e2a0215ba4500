#!/bin/bash
# Round-trip a wav at every bandwidth (analogue of reference
# scripts/compression.sh).
#   ./scripts/compression.sh input.wav output_dir [model] [checkpoint]
set -euo pipefail
cd "$(dirname "$0")/.."

INPUT=${1:?usage: compression.sh input.wav output_dir [model] [checkpoint]}
OUTDIR=${2:?usage: compression.sh input.wav output_dir [model] [checkpoint]}
MODEL=${3:-my_encodec}
CKPT=${4:-}
mkdir -p "$OUTDIR"

for BW in 1.5 3 6 12 24; do
  echo "=== bandwidth ${BW} kbps ==="
  ARGS=(-m "$MODEL" -b "$BW" -f -r)
  if [ -n "$CKPT" ]; then ARGS+=(-c "$CKPT"); fi
  python -m encodec_pytorch_tpu.cli "$INPUT" \
    "$OUTDIR/$(basename "${INPUT%.wav}")_bw${BW%.}.wav" "${ARGS[@]}"
done

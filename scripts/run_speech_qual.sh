#!/bin/bash
# bf16-vs-f32 training qualification on speech-anchored data
# (docs/PERF_NOTES.md "Speech-anchored quality re-anchoring"; VERDICT r3 #5).
# Two same-seed 100-epoch production runs differing ONLY in compute dtype,
# then held-out speech metrics from the final checkpoints at bw 24.
# One v5e chip, ~10 min per run including the cold compile.
set -ex
OUT=${OUT:-/tmp/speech_qual}
cd "$(dirname "$0")/.."

python scripts/make_speech_set.py --out "$OUT/data" --n-train 48 --n-test 12

COMMON="datasets.train_csv_path=$OUT/data/train.csv \
  datasets.test_csv_path=$OUT/data/test.csv datasets.num_workers=2 \
  common.max_epoch=100 common.test_interval=10 common.save_interval=100"

for DT in bfloat16 float32; do
  python -m encodec_pytorch_tpu.train_cli \
    checkpoint.save_folder="$OUT/run_$DT" tpu.compute_dtype=$DT $COMMON
  python scripts/eval_checkpoint_quality.py "$OUT/run_$DT" \
    --wav-dir "$OUT/data/test" --bandwidth 24
done

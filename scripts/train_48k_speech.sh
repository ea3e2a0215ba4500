#!/bin/bash
# End-to-end 48 kHz stereo training on the in-sandbox speech family
# (VERDICT r4 item 3: the 48k family previously had serving numbers but no
# trained-model evidence). Builds the stereo 48 kHz speech set (same
# augmentation stream as the 24 kHz anchor set, resampled + pan/delay
# stereoized), trains the encodec_48khz flavor (non-causal,
# time_group_norm, volume-normalized 1 s segments, l_g=l_feat=4 — the
# reference's train.sbatch reproduction settings), then reports held-out
# quality through the same evaluator as the 24 kHz runs.
#
# One v5e chip; see docs/PERF_NOTES.md "48 kHz training on chip" for the
# measured step time and the run's numbers.
set -ex
OUT=${OUT:-/tmp/train48k}
EPOCHS=${EPOCHS:-700}
cd "$(dirname "$0")/.."

python scripts/make_speech_set.py --out "$OUT/data" --n-train 96 --n-test 12 \
    --seconds 4.0 --sample-rate 48000 --stereo

python -m encodec_pytorch_tpu.train_cli --config config_48k_stereo \
    datasets.train_csv_path="$OUT/data/train.csv" \
    datasets.test_csv_path="$OUT/data/test.csv" \
    datasets.batch_size=16 datasets.num_workers=2 \
    common.max_epoch=$EPOCHS common.test_interval=50 \
    common.save_interval=$EPOCHS common.log_interval=96 \
    checkpoint.save_folder="$OUT/run" \
    tpu.compute_dtype=bfloat16

for BW in 6 12 24; do
  python scripts/eval_checkpoint_quality.py "$OUT/run" \
      --config config_48k_stereo --wav-dir "$OUT/data/test" --bandwidth $BW \
      datasets.batch_size=16
done

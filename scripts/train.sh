#!/bin/bash
# Single-host training launcher (analogue of reference scripts/train.sh).
# Dot-path overrides pass straight through to the config system, e.g. the
# 5-scale discriminator override from the reference script.
set -euo pipefail
cd "$(dirname "$0")/.."

python -m encodec_pytorch_tpu.train_cli \
  datasets.tensor_cut=72000 \
  datasets.batch_size=12 \
  common.max_epoch=100 \
  common.log_interval=5 \
  lr_scheduler.warmup_epoch=2 \
  model.disc_win_lengths='[1024,2048,512,256,128]' \
  model.disc_hop_lengths='[256,512,128,64,32]' \
  model.disc_n_ffts='[1024,2048,512,256,128]' \
  "$@"

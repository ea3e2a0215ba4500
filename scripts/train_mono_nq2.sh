#!/bin/bash
# Mono n_q=2 training (analogue of reference run_training.sh /
# setup_mono_training.sh for the eigenscape multi-channel dataset).
set -euo pipefail
cd "$(dirname "$0")/.."

python -m encodec_pytorch_tpu.train_cli --config config_mono_nq2 "$@"

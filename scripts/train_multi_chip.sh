#!/bin/bash
# Data-parallel training over every chip jax can see (analogue of reference
# scripts/train_multi_gpu.sh — no mp.spawn/NCCL: the SPMD step shards the
# batch over the mesh). For multi-host TPU pods run this same command on each
# host; jax.distributed.initialize picks up the TPU environment.
set -euo pipefail
cd "$(dirname "$0")/.."

python -m encodec_pytorch_tpu.train_cli \
  distributed.data_parallel=True \
  distributed.world_size=0 \
  datasets.batch_size=64 \
  "$@"

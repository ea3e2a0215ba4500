#!/bin/bash
# Multi-host TPU pod launcher — the analogue of the reference's Slurm script
# (/root/reference/scripts/train.sbatch, which srun's one process per GPU).
#
# On TPU pods there is no mp.spawn/srun fan-out in the framework: ONE python
# process per host, all running the same SPMD program; JAX discovers the pod
# topology from the TPU metadata (jax.distributed.initialize with no args —
# wired in encodec_pytorch_tpu/parallel/mesh.py:initialize_distributed).
# The DataLoader shards samples per process automatically
# (train/trainer.py passes shard_id=jax.process_index()).
#
# Usage:
#   TPU_NAME=my-pod ZONE=us-central1-a PROJECT=my-proj \
#     scripts/train_pod.sh [config overrides...]
# Example (the reference train.sbatch 48 kHz stereo reproduction):
#   scripts/train_pod.sh --config config_48k_stereo \
#     datasets.batch_size=64 balancer.weights.l_g=4
set -euo pipefail

TPU_NAME=${TPU_NAME:?set TPU_NAME}
ZONE=${ZONE:?set ZONE}
PROJECT=${PROJECT:-$(gcloud config get-value project)}
WORKDIR=${WORKDIR:-/tmp/encodec_pytorch_tpu}
REPO_URL=${REPO_URL:-}

# Ship the repo to every host (rsync if REPO_URL unset).
if [ -z "$REPO_URL" ]; then
  gcloud compute tpus tpu-vm scp --recurse "$(dirname "$0")/.." \
    "$TPU_NAME:$WORKDIR" --zone="$ZONE" --project="$PROJECT" --worker=all
else
  gcloud compute tpus tpu-vm ssh "$TPU_NAME" --zone="$ZONE" \
    --project="$PROJECT" --worker=all \
    --command="rm -rf $WORKDIR && git clone $REPO_URL $WORKDIR"
fi

# One process per host; JAX_COORDINATOR is not needed on Cloud TPU (the
# runtime provides topology), but JAX_COORDINATOR=<host0-ip>:8476 works for
# DCN-connected CPU/GPU fleets too.
gcloud compute tpus tpu-vm ssh "$TPU_NAME" --zone="$ZONE" \
  --project="$PROJECT" --worker=all \
  --command="cd $WORKDIR && JAX_COORDINATOR=auto \
    python -m encodec_pytorch_tpu.train_cli $*"

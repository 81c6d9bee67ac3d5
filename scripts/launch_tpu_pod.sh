#!/usr/bin/env bash
# Multi-host TPU pod launcher (the reference's `train.sbatch` analog).
#
# Run the same command on every TPU-VM worker of a pod slice, e.g. via
#   gcloud compute tpus tpu-vm ssh $TPU_NAME --worker=all \
#     --command="cd gluefactory_tpu && bash scripts/launch_tpu_pod.sh <exp> <conf> [dotlist...]"
#
# jax.distributed.initialize() picks up the TPU pod topology automatically;
# each process loads its own shard of every batch (Loader process_index
# sharding) and only process 0 writes checkpoints/logs.
set -euo pipefail

EXP=${1:?experiment name}
CONF=${2:?config name}
shift 2

export GLUEFACTORY_DATA=${GLUEFACTORY_DATA:-$HOME/data}
export GLUEFACTORY_TRAINING=${GLUEFACTORY_TRAINING:-$HOME/outputs/training}

python -m gluefactory_tpu.train "$EXP" --conf "$CONF" --distributed "$@"

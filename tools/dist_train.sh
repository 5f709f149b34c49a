#!/usr/bin/env bash
# Multi-host training launcher (reference tools/dist_train.sh analog).
#
# The reference wraps torch.distributed.launch; the JAX equivalent is one
# identical process per host calling jax.distributed.initialize()
# (tools/train.py --multihost). On Cloud TPU pods initialize() autodetects
# the coordinator from the TPU metadata — run this same script on every
# host (e.g. via `gcloud compute tpus tpu-vm ssh --worker=all`).
#
# For explicit clusters set the standard JAX env first:
#   JAX_COORDINATOR_ADDRESS=host0:1234 JAX_NUM_PROCESSES=4 JAX_PROCESS_ID=k
#
# Usage: ./tools/dist_train.sh <config> <work_dir> --train-ann <ann.json> \
#            [extra train.py args...]
set -euo pipefail

CONFIG=${1:?usage: dist_train.sh <config> <work_dir> [args...]}
WORK_DIR=${2:?usage: dist_train.sh <config> <work_dir> [args...]}
shift 2

exec python "$(dirname "$0")/train.py" \
    --config "$CONFIG" --work-dir "$WORK_DIR" --multihost "$@"

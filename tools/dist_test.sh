#!/usr/bin/env bash
# Multi-chip evaluation launcher (reference tools/dist_test.sh analog).
#
# Single host, N local chips: batch-parallel eval over a 'data' mesh
# (tools/test.py --chips N, the multi_gpu_test analog). For multi-host
# pods, run tools/test.py on every host with --multihost-style env (see
# dist_train.sh); evaluate_dataset shards batches per process and gathers
# detections across hosts.
#
# Usage: ./tools/dist_test.sh <config> <checkpoint> <n_chips> [extra args...]
set -euo pipefail

CONFIG=${1:?usage: dist_test.sh <config> <checkpoint> <n_chips> [args...]}
CHECKPOINT=${2:?usage: dist_test.sh <config> <checkpoint> <n_chips> [args...]}
CHIPS=${3:?usage: dist_test.sh <config> <checkpoint> <n_chips> [args...]}
shift 3

exec python "$(dirname "$0")/test.py" \
    --config "$CONFIG" --checkpoint "$CHECKPOINT" --chips "$CHIPS" "$@"

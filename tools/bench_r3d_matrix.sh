#!/bin/bash
# Round-3d on-chip A/B: the three uncommitted gates
#   HTD_RPN_FUSED_1X1 (fused 1x1 RPN heads)
#   HTD_BA_S1_FAST    (corner-gather fast path for S=1 BA levels)
#   HTD_V4_SKIP_EMPTY (v4 empty-bin compute+DMA skip)
# vs their off states. Usage: bash tools/bench_r3d_matrix.sh /tmp/r3d
set -u
OUT=${1:-/tmp/r3d}
mkdir -p "$OUT"
cd /root/repo

run() {
  local name=$1; shift
  echo "=== $name ($*)" | tee -a "$OUT/summary.log"
  env "$@" timeout 900 python bench.py > "$OUT/$name.json" 2> "$OUT/$name.err"
  tail -1 "$OUT/$name.json" | tee -a "$OUT/summary.log"
}

echo "== chip calibration" | tee "$OUT/summary.log"
timeout 300 python tools/calibrate_chip.py 2>/dev/null | tee -a "$OUT/summary.log"

run base            HTD_NOOP=1
run fused_off       HTD_RPN_FUSED_1X1=0
run ba_s1_off       HTD_BA_S1_FAST=0
run skip_empty_off  HTD_V4_SKIP_EMPTY=0
run all_off         HTD_RPN_FUSED_1X1=0 HTD_BA_S1_FAST=0 HTD_V4_SKIP_EMPTY=0

echo "== done" | tee -a "$OUT/summary.log"

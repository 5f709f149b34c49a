#!/bin/bash
# Round-3e re-measurement of the model family / batch scaling / train step
# at the current (round-3d) defaults. All prior family numbers in PERF.md
# pre-date the empty-bin skip, fused RPN heads, tap-dot convs and the
# fused DCN kernel defaults. Usage: bash tools/bench_r3e_matrix.sh /tmp/r3e
set -u
OUT=${1:-/tmp/r3e}
mkdir -p "$OUT"
cd /root/repo

run() {
  local name=$1; shift
  echo "=== $name ($*)" | tee -a "$OUT/summary.log"
  timeout 900 python tools/benchmark.py --bf16 "$@" > "$OUT/$name.json" 2> "$OUT/$name.err"
  tail -1 "$OUT/$name.json" | tee -a "$OUT/summary.log"
}

echo "== chip calibration" | tee "$OUT/summary.log"
timeout 300 python tools/calibrate_chip.py 2>/dev/null | tee -a "$OUT/summary.log"

run r101_dcn   --config htd_r101_dcn_2x
run x101_dcn   --config htd_x101_dcn_2x
run r50_b2     --config htd_r50_1x --batch-size 2
run r50_b4     --config htd_r50_1x --batch-size 4
run r50_train  --config htd_r50_1x --train --batch-size 2

echo "== done" | tee -a "$OUT/summary.log"

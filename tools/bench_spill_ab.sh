#!/bin/bash
# Spill-bin / conditional-fallback A/B matrix (round 3f).
# Usage: bash tools/bench_spill_ab.sh [outdir]   (default /tmp/r3spill)
set -u
OUT=${1:-/tmp/r3spill}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() {  # run <name> <timeout_s> <env...> -- <cmd...>
  local name=$1 t=$2; shift 2
  local envs=()
  while [ "$1" != "--" ]; do envs+=("$1"); shift; done
  shift
  echo "=== $name (timeout ${t}s) $(date +%H:%M:%S)" | tee -a "$OUT/summary.log"
  timeout "$t" env "${envs[@]}" "$@" > "$OUT/$name.log" 2>&1
  echo "rc=$? $name" | tee -a "$OUT/summary.log"
  tail -3 "$OUT/$name.log" | tee -a "$OUT/summary.log"
}

# 0. chip-day calibration + on-chip kernel correctness (spill is default now)
run calib 600 _X=1 -- python tools/calibrate_chip.py
run tpu_kernels 2400 HTD_TEST_TPU=1 -- python tools/tpu_kernel_check.py

# 1. end-to-end R-50: new default (spill on) vs old (spill off) vs cond-fallback
run bench_spill_on   1200 _X=1 -- python bench.py
run bench_spill_off  1200 HTD_V4_SPILL=0 -- python bench.py
run bench_fbcond     1200 HTD_FB_COND=1 -- python bench.py
run bench_spill_off_fbcond 1200 HTD_V4_SPILL=0 HTD_FB_COND=1 -- python bench.py

# 2. batch-4 (fallback gather was the #1 op at b4): default vs fbcond
run stages_b4_spill_on 2400 _X=1 -- python tools/bench_stages.py --batch-size 4 --stages full
run stages_b4_fbcond   2400 HTD_FB_COND=1 -- python tools/bench_stages.py --batch-size 4 --stages full

echo "=== spill matrix done $(date +%H:%M:%S)" | tee -a "$OUT/summary.log"

#!/bin/bash
# Capped spill-budget A/B (round 3f follow-up): HTD_V4_SPILL=k budget mode
# vs exhaustive (1) vs off (0), composed with HTD_FB_COND.
# Usage: bash tools/bench_spill2_ab.sh [outdir]   (default /tmp/r3spill2)
set -u
OUT=${1:-/tmp/r3spill2}
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

# b1 R-50: budget spill (8/16 bins) with and without conditional fallback
run bench_spill8         1200 HTD_V4_SPILL=8 -- python bench.py
run bench_spill8_fbcond  1200 HTD_V4_SPILL=8 HTD_FB_COND=1 -- python bench.py
run bench_spill16_fbcond 1200 HTD_V4_SPILL=16 HTD_FB_COND=1 -- python bench.py

# b4: budget spill + cond fallback (compare stages_b4_* rows in /tmp/r3spill:
# spill_on 172.1 ms, spill_on+fbcond 161.8 ms, old default [spill off] 185.5)
run stages_b4_spill16_fbcond 2400 HTD_V4_SPILL=16 HTD_FB_COND=1 -- python tools/bench_stages.py --batch-size 4 --stages full

echo "=== spill2 matrix done $(date +%H:%M:%S)" | tee -a "$OUT/summary.log"

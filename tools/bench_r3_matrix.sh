#!/bin/bash
# Round-3 TPU A/B matrix — run the moment the tunnel is back.
# Usage: bash tools/bench_r3_matrix.sh [outdir]   (default /tmp/r3ab)
# Each step is independently timeout-bounded so a dead tunnel can't wedge
# the run; logs land in $OUT/<name>.log. Order: cheapest validation first
# (kernel correctness on real TPU), then stage bisection per variant,
# then end-to-end bench for the winners, then batch scaling.
set -u
OUT=${1:-/tmp/r3ab}
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

# 0. kernel correctness on the REAL chip (pallas kernels + pyramid builder
#    + packed variant actually compile under Mosaic and bit-match)
run tpu_kernels 2400 HTD_TEST_TPU=1 -- python tools/tpu_kernel_check.py

# 1. stage bisection per variant (v4 kernel prefix + full)
ST="python tools/bench_stages.py --stages backbone_fpn extract_part_v4kernel extract_part_v4full rpn_proposals stage1 full"
run stages_default 2400 _X=1 -- $ST
run stages_packed  2400 HTD_V4_PACKED=1 -- $ST
run stages_xlapyr  2400 HTD_XLA_PYRAMID=1 -- $ST   # revert-check: builder off
run stages_v3      2400 _X=1 -- python tools/bench_stages.py \
    --set roi_extractor.impl=pallas_v3 --stages backbone_fpn rpn_proposals stage1 full

run stages_topk 2400 HTD_FLAT_TOPK=1 -- python tools/bench_stages.py \
    --stages backbone_fpn rpn_proposals full

# 2. end-to-end bench, default vs packed
run bench_default 1200 _X=1 -- python bench.py
run bench_packed  1200 HTD_V4_PACKED=1 -- python bench.py

# 3. batch scaling (per-image throughput at batch 2/4)
run stages_b2 2400 _X=1 -- python tools/bench_stages.py --batch-size 2 --stages backbone_fpn full
run stages_b4 2400 _X=1 -- python tools/bench_stages.py --batch-size 4 --stages backbone_fpn full

# 4. model family (flagship R-101-DCN at its test scale; DCN stage split)
run stages_r101dcn 2400 _X=1 -- python tools/bench_stages.py \
    --config htd_r101_dcn_2x --stages backbone_fpn rpn_proposals stage1 full
run bench_r101dcn 1800 _X=1 -- python tools/benchmark.py --config htd_r101_dcn_2x
run bench_r101dcn_fence 1800 HTD_DCN_FENCE=1 -- python tools/benchmark.py --config htd_r101_dcn_2x
run bench_x101dcn 1800 _X=1 -- python tools/benchmark.py --config htd_x101_dcn_2x

echo "=== matrix done $(date +%H:%M:%S)" | tee -a "$OUT/summary.log"

#!/bin/bash
# Round-5 tail batch: distill retry (after the teacher-params-as-argument
# fix — the closure-constant serialization broke the first attempt) and the
# production-combo pod point.
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
OUT=/tmp/r5_tail.jsonl
: > "$OUT"

run_bench() {
  local tag="$1"; shift
  echo "=== $tag : $* ===" >&2
  local t0=$(date +%s)
  local line
  line=$(timeout 3600 python bench.py --no-secondary "$@" 2>/tmp/r5_last_err.log | tail -1)
  local rc=$?
  local t1=$(date +%s)
  echo "{\"tag\": \"$tag\", \"rc\": $rc, \"wall_s\": $((t1-t0)), \"result\": $([ -n "$line" ] && echo "$line" || echo null)}" >> "$OUT"
  echo "$tag done rc=$rc wall=$((t1-t0))s: $line" >&2
}

run_bench local_distill --loss distill
# production combo: ctx64 + int8 MaxSim at the v5e-64 recipe shape
run_bench pod_ctx64_int8 --pod-devices 64 --token-neighborhood 8 --text-ctx 64 --maxsim-impl streaming_int8

run_inf() {
  local tag="$1"; shift
  echo "=== $tag : $* ===" >&2
  local t0=$(date +%s)
  local lines
  lines=$(timeout 3600 python scripts/bench_inference.py "$@" 2>>/tmp/r5_last_err.log | tail -3)
  local t1=$(date +%s)
  echo "{\"tag\": \"$tag\", \"wall_s\": $((t1-t0))}" >> "$OUT"
  echo "$lines" >> "$OUT"
  echo "$tag done wall=$((t1-t0))s" >&2
}

# serving ctx-bucket A/B (the --text-buckets path): text encode at 32 vs 77
run_inf inf_base
run_inf inf_ctx32 --text-ctx 32

cat "$OUT"

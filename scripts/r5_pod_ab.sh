#!/bin/bash
# Round-5 pod-shape A/B batch: same-session baseline + text-ctx + int8 MaxSim.
# One config at a time (one process holds the chip); compile cache persists.
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
OUT=/tmp/r5_pod_ab.jsonl
: > "$OUT"

run() {
  local tag="$1"; shift
  echo "=== $tag : $* ===" >&2
  local t0=$(date +%s)
  local line
  line=$(timeout 2400 python bench.py --no-secondary "$@" 2>/tmp/r5_last_err.log | tail -1)
  local rc=$?
  local t1=$(date +%s)
  echo "{\"tag\": \"$tag\", \"rc\": $rc, \"wall_s\": $((t1-t0)), \"result\": $([ -n "$line" ] && echo "$line" || echo null)}" >> "$OUT"
  echo "$tag done rc=$rc wall=$((t1-t0))s: $line" >&2
}

# 1. same-session pod baseline (v5e-64 recipe shape)
run pod_base --pod-devices 64 --token-neighborhood 8
# 2. text-ctx 32 at the pod shape (VERDICT #7 money measurement)
run pod_ctx32 --pod-devices 64 --token-neighborhood 8 --text-ctx 32
# 3. int8 streaming MaxSim at the pod shape (VERDICT #5, decisive shape)
run pod_int8 --pod-devices 64 --token-neighborhood 8 --maxsim-impl streaming_int8
# 4. both combined
run pod_ctx32_int8 --pod-devices 64 --token-neighborhood 8 --text-ctx 32 --maxsim-impl streaming_int8
# 5. flagship local text-ctx 32 (does the tower-side win show at b256 local?)
run local_ctx32 --text-ctx 32
# 6. flagship local re-baseline
run local_base

cat "$OUT"

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
  line=$(timeout 3600 python bench.py --no-secondary "$@" 2>/tmp/r5_last_err.log | tail -1)
  local rc=$?
  local t1=$(date +%s)
  echo "{\"tag\": \"$tag\", \"rc\": $rc, \"wall_s\": $((t1-t0)), \"result\": $([ -n "$line" ] && echo "$line" || echo null)}" >> "$OUT"
  echo "$tag done rc=$rc wall=$((t1-t0))s: $line" >&2
}

# 1. flagship local re-baseline (cache-hot compile: doubles as relay health
#    check — if this stalls, the session's relay is bad, not the new shapes)
run local_base
# 2. same-session pod baseline (v5e-64 recipe shape; compiled last session)
run pod_base --pod-devices 64 --token-neighborhood 8
# 3. text-ctx 32 at the pod shape (VERDICT #7 money measurement)
run pod_ctx32 --pod-devices 64 --token-neighborhood 8 --text-ctx 32
# 4. int8 streaming MaxSim at the pod shape (VERDICT #5, decisive shape)
run pod_int8 --pod-devices 64 --token-neighborhood 8 --maxsim-impl streaming_int8
# 5. both combined
run pod_ctx32_int8 --pod-devices 64 --token-neighborhood 8 --text-ctx 32 --maxsim-impl streaming_int8
# 6. flagship local text-ctx 32 (does the tower-side win show at b256 local?)
run local_ctx32 --text-ctx 32
# 7. int8 MLP forward at the flagship (VERDICT #5's named experiment)
# (explicit export/unset: VAR=x func-call leaks the var in bash)
export COLXLIP_MLP_INT8=fwd
run local_mlp_int8
unset COLXLIP_MLP_INT8
# 8. siglip + distill on chip (VERDICT weak #7: unbenchmarked families)
run local_siglip --loss siglip
run local_distill --loss distill

cat "$OUT"

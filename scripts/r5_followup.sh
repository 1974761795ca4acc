#!/bin/bash
# Round-5 follow-up chip batch: runs after r5_pod_ab.sh.
#  - ctx-64 pod shape: the production --text-ctx cap for the merged recipes
#    (caption_length_stats: fits_64 = 0.9985 of merged captions intact).
#  - int8 loss-trajectory drift A/Bs (VERDICT r4 #5's second half).
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
OUT=/tmp/r5_followup.jsonl
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

run_drift() {
  local tag="$1"; shift
  echo "=== drift $tag : $* ===" >&2
  local t0=$(date +%s)
  local line
  line=$(timeout 3600 python scripts/int8_drift.py "$@" 2>>/tmp/r5_last_err.log | tail -1)
  local rc=$?
  local t1=$(date +%s)
  echo "{\"tag\": \"$tag\", \"rc\": $rc, \"wall_s\": $((t1-t0)), \"result\": $([ -n "$line" ] && echo "$line" || echo null)}" >> "$OUT"
  echo "drift $tag done rc=$rc wall=$((t1-t0))s" >&2
}

# production text-ctx cap at the pod shape
run_bench pod_ctx64 --pod-devices 64 --token-neighborhood 8 --text-ctx 64

# ViT-L: same-session baseline + the cap, local and at the v5e-64 recipe
# shape (scripts/train_vitl14_v5e64.sh: b64/chip, K=8 -> 512-row window)
run_bench vitl_base --model ViT-L-14-colxlip --batch-size 64
run_bench vitl_ctx64 --model ViT-L-14-colxlip --batch-size 64 --text-ctx 64
run_bench vitl_pod_base --model ViT-L-14-colxlip --batch-size 64 --pod-devices 64 --token-neighborhood 8
run_bench vitl_pod_ctx64 --model ViT-L-14-colxlip --batch-size 64 --pod-devices 64 --token-neighborhood 8 --text-ctx 64

# int8 drift trajectories (same seed; diff the trajectories host-side)
run_drift bf16_base
export COLXLIP_MLP_INT8=fwd
run_drift mlp_int8
unset COLXLIP_MLP_INT8
run_drift maxsim_int8 --maxsim-impl streaming_int8

cat "$OUT"

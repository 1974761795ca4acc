#!/bin/bash
# Merged-30M pod-scale run on TPU v5e-64 (8 hosts x 8 chips).
# TPU-native analog of the reference's multi-node torchrun runs
# (src/train_merged30m_slurm.sh:22-45): '::'-joined 3-source weighted shard
# spec, one driver process per host, jax.distributed rendezvous via the
# coordinator. Launch on every host of the pod, e.g.:
#   gcloud compute tpus tpu-vm ssh "$TPU_NAME" --worker=all \
#     --command="cd /workspace/colxlip_tpu && bash scripts/train_merged30m_v5e64.sh"
# On Cloud TPU, jax.distributed.initialize() auto-discovers the pod topology,
# so COORD/NPROC/PID can be left unset there.
set -euo pipefail

DATA=${DATA:-"/data/cc3m/{0000..0575}.tar::/data/cc12m/{0000..1242}.tar::/data/yfcc15m/{0000..1536}.tar"}
WEIGHTS=${WEIGHTS:-"1.0::1.0::1.0"}
LOGS=${LOGS:-./logs}

# Batch 256/chip (16k global on 64 chips) is the measured v5e flagship point
# for the towers: 793-805 img/s at 256 vs 645 at 512 single-chip; the round-4
# cliff analysis (scripts/cliff_analysis.py, docs/BENCH.md) attributes most
# of that drop to the O(B^2) local MaxSim loss FLOPs, with only ~10% being
# XLA remat re-execution (clip-loss towers at 512 still run 806 img/s at 77%
# MFU). For the 32k-global ablation, straight --batch-size 512 beats
# --accum-freq 2 (506.9 img/s measured: the accumulation pays an extra
# no-grad pass and recomputes the full-bank loss per microbatch —
# reference train.py:139-185 semantics).
#
# --token-dist ring is REQUIRED at this scale. The default 'gather' mode
# all-gathers every device's token features (reference loss.py:235-243):
# at 32k global that is [32768,77,512] + [32768,196,512] bf16 ≈ 2.6 + 6.6 =
# 9.2 GB landing on EVERY 16-GB chip before the MaxSim tiles — guaranteed
# OOM. The ppermute ring holds ONE remote block at a time
# (256*(77+196)*512*2 B ≈ 71 MB) and is loss/grad-exact vs the gather
# (tests/ring64_probe.py: 64-way parity to 1e-6).
#
# --token-neighborhood 8 bounds the token-CE FLOPs, which scale with the
# GLOBAL batch: the MaxSim token loss is O(B_local x B_global) — the loss,
# not the towers, dominates pod-scale colclip. K=8 gives every sample
# 8*256 = 2048 token-CE negatives — exactly the reference's own colxlip
# training envelope (colxlip.sh: global batch 2048, full token loss).
# MEASURED on the v5e chip (round 5, bench.py --pod-devices 64
# --token-neighborhood 8 --batch-size 256 — the exact per-chip loss math
# of this recipe, tests/test_pod_shape.py): 330.7-331.6 img/s/chip across
# sessions; the 2048-global full-ring envelope (--pod-devices 8, K=0)
# measures the same 331.1 — the token window, not the pooled bank, sets
# the cost. The gathered-window alternative to the ring scan measured
# SLOWER (304.7; --window-mode fused). The cheap pooled InfoNCE keeps ALL
# 16k/32k global negatives. Set 0 to restore the exact full-global token
# loss.
#
# --text-ctx 64 caps the text context on the data side (model params and
# every eval path keep 77; the tokenizer forces EOT into the last slot).
# The merged-caption distribution this recipe trains on fits 64 at 99.85%
# (scripts/caption_length_stats.py, p95=49) — the 0.15% tail truncates
# exactly as the reference truncates everything at 77 — and the capped
# token-CE window is linear in Lt, so the step gets dramatically cheaper:
# MEASURED 380.6 img/s/chip at this recipe's exact shape (vs 331.6 at
# ctx 77, +15%; ~24k img/s on the v5e-64). The train log's
# text_trunc_rate meter warns if a different feed under-sizes the cap.
#
# --ship-format yuv420 + --packed-feed: the feed wire format (round 4,
# ops/yuv420.py + parallel/data_feed.py). 1.5 bytes/px planar YUV 4:2:0
# (half of uint8 RGB on PCIe/disk; decode-to-normalized-RGB is one fused
# affine on device, 0.93 ms/batch) and images+texts fused into ONE
# host->device transfer per step. Measured: ViT-L real-data within ~10% of
# its synthetic bound with data_time ~= 0 (docs/BENCH.md round-4).
python -m colxlip_tpu.main \
    --train-data "$DATA" \
    --train-data-upsampling-factors "$WEIGHTS" \
    --train-num-samples 27000000 \
    --dataset-resampled \
    --logs "$LOGS" \
    --model ViT-B-16-colxlip \
    --alpha 0.7 \
    --batch-size 256 \
    --local-loss \
    --token-dist ring \
    --token-neighborhood 8 \
    --text-ctx 64 \
    --gather-with-grad \
    --ship-format yuv420 \
    --packed-feed \
    --epochs 10 \
    --lr 5e-4 \
    --warmup 10000 \
    --precision bf16 \
    --workers 16 \
    --num-sampled-captions 8 \
    --save-frequency 1 \
    --save-most-recent \
    --delete-previous-checkpoint \
    --async-checkpoint \
    --resume latest \
    --preempt-save \
    --report-to jsonl \
    ${COORD:+--dist-coordinator "$COORD"} \
    ${NPROC:+--dist-num-processes "$NPROC"} \
    ${PID:+--dist-process-id "$PID"} \
    "$@"

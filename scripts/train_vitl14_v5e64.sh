#!/bin/bash
# ViT-L/14 ColXLIP pod run on TPU v5e-64 (8 hosts x 8 chips).
# The perf-flagship scale: measured 223-225 img/s/chip (79-80% MFU) at the
# batch-64/chip throughput point (docs/BENCH.md ViT-L sections). Launch like
# scripts/train_merged30m_v5e64.sh (one process per host; on Cloud TPU the
# pod topology is auto-discovered).
set -euo pipefail

DATA=${DATA:-"/data/cc3m/{0000..0575}.tar::/data/cc12m/{0000..1242}.tar::/data/yfcc15m/{0000..1536}.tar"}
WEIGHTS=${WEIGHTS:-"1.0::1.0::1.0"}
LOGS=${LOGS:-./logs}

# Batch arithmetic at ViT-L/14 on 64 chips (global batch 64*64 = 4096):
#
# - 64/chip is the measured throughput point: batch 96 gives a higher device
#   TF/s but FEWER img/s (the O(B^2) MaxSim loss adds FLOPs per image), and
#   batch 128 additionally trips XLA's HBM-pressure remat (docs/BENCH.md).
# - token-dist gather would land [4096,77,768] + [4096,257,768] bf16
#   ~ 0.5 + 1.6 = 2.1 GB of gathered token features on every chip — it fits
#   in isolation, but the ViT-L step (5 GB state + activations at the remat
#   cliff) has no 2.1 GB of headroom. The ppermute ring holds ONE rotating
#   block (64*(77+257)*768*2 B ~ 33 MB) at a time; loss/grad-exact vs gather
#   (tests/ring64_probe.py proves 64-way parity).
# - token-neighborhood 8 bounds the token-CE MaxSim FLOPs (O(B_local x
#   B_global) — at 4096 global and ViT-L token shapes the full loss is
#   ~2x the tower compute per image) to an 8-device window: 8*64 = 512
#   token negatives per sample, loss cost ~1/8th, pooled InfoNCE still over
#   all 4096. Set 0 for the exact full-global token loss.
# - Seeding from pretrained: --pretrained laion400m_e32 resolves through the
#   ViT-L-14 registry tags (pretrained.py; '-colxlip' reuses base weights,
#   reference factory.py:318-334). Requires the CLIP BPE merges asset
#   (scripts/fetch_assets.py) — the driver hard-errors without it.
# - --text-ctx 64: data-side context cap, lossless for 99.85% of the
#   merged-caption feed (scripts/caption_length_stats.py; params/eval keep
#   77). Measured at the ViT-B recipe shape: +15% img/s at ctx 64, and the
#   capped token-CE window is linear in Lt so ViT-L's 512-row window
#   shrinks the same way. The train log's text_trunc_rate meter warns if a
#   different feed under-sizes the cap.
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
    --model ViT-L-14-colxlip \
    ${PRETRAINED:+--pretrained "$PRETRAINED"} \
    --alpha 0.7 \
    --batch-size 64 \
    --local-loss \
    --token-dist ring \
    --token-neighborhood 8 \
    --text-ctx 64 \
    --gather-with-grad \
    --ship-format yuv420 \
    --packed-feed \
    --epochs 10 \
    --lr 1e-5 \
    --beta2 0.98 \
    --warmup 2000 \
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

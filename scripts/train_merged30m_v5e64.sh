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

python -m colxlip_tpu.main \
    --train-data "$DATA" \
    --train-data-upsampling-factors "$WEIGHTS" \
    --train-num-samples 27000000 \
    --dataset-resampled \
    --logs "$LOGS" \
    --model ViT-B-16-colxlip \
    --alpha 0.7 \
    --batch-size 512 \
    --local-loss \
    --gather-with-grad \
    --grad-checkpointing \
    --epochs 10 \
    --lr 5e-4 \
    --warmup 10000 \
    --precision bf16 \
    --workers 16 \
    --num-sampled-captions 8 \
    --save-frequency 1 \
    --save-most-recent \
    --delete-previous-checkpoint \
    --report-to jsonl \
    ${COORD:+--dist-coordinator "$COORD"} \
    ${NPROC:+--dist-num-processes "$NPROC"} \
    ${PID:+--dist-process-id "$PID"} \
    "$@"

#!/bin/bash
# ColXLIP CC3M recipe on a single TPU v5e host (8 chips).
# TPU-native analog of the reference's 4xA100 SLURM run (src/colxlip.sh:34-59):
# ViT-B-32-colxlip from a base checkpoint, global batch 2048, lr 1e-5,
# warmup 2000, 32 epochs, alpha 0.7. One process drives all local chips; the
# data-parallel mesh and loss collectives are set up by the driver.
set -euo pipefail

DATA=${DATA:-/data/cc3m/cc3m-train-{0000..0575}.tar}
LOGS=${LOGS:-./logs}
PRETRAINED=${PRETRAINED:-}   # path to a base ViT-B-32 .pt or orbax checkpoint

python -m colxlip_tpu.main \
    --train-data "$DATA" \
    --train-num-samples 2823019 \
    --dataset-resampled \
    --logs "$LOGS" \
    --model ViT-B-32-colxlip \
    ${PRETRAINED:+--pretrained "$PRETRAINED"} \
    --alpha 0.7 \
    --batch-size 256 \
    --ship-format yuv420 \
    --packed-feed \
    --epochs 32 \
    --lr 1e-5 \
    --warmup 2000 \
    --precision bf16 \
    --workers 8 \
    --num-sampled-captions 8 \
    --save-frequency 1 \
    --delete-previous-checkpoint \
    --report-to jsonl \
    --retrieval-coco --coco-data-root-dir "${COCO_DIR:-/data/coco}" \
    "$@"

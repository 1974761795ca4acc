#!/bin/bash
# No-data smoke run (reference src/test.sh analog): synthetic dataset,
# tiny step count, verifies the full driver path on whatever chips exist.
set -euo pipefail
python -m colxlip_tpu.main \
    --model ViT-B-32-colxlip \
    --dataset-type synthetic \
    --train-num-samples 1024 \
    --batch-size 32 \
    --epochs 1 \
    --lr 1e-4 \
    --warmup 10 \
    --precision bf16 \
    --logs ./logs --name smoke \
    --log-every-n-steps 1 \
    "$@"

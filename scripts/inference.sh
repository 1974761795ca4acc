#!/bin/bash
# Eval-only run over all 7 retrieval suites (reference src/inference.sh:1-28),
# with token-level MaxSim late-interaction scoring (--eval-scoring maxsim —
# working here, unlike the reference's crashing ColXLIP eval path).
set -euo pipefail

CKPT=${CKPT:?set CKPT to a .pt or orbax checkpoint}
# annotation JSONs are vendored in datasets/ (reference layout); drop the
# suite images in next to them per datasets/EVAL_DATASETS.md, or point
# DATAROOT at a full data directory
DATAROOT=${DATAROOT:-"$(cd "$(dirname "$0")/.." && pwd)/datasets"}

python -m colxlip_tpu.main \
    --model ViT-B-16-colxlip \
    --pretrained "$CKPT" \
    --batch-size 256 \
    --eval-scoring "${SCORING:-mixed}" \
    --alpha 0.7 \
    --retrieval-coco --coco-data-root-dir "$DATAROOT/coco" \
    --retrieval-flickr --flickr-data-root-dir "$DATAROOT/flickr30k-images" \
    --retrieval-docci --docci-data-root-dir "$DATAROOT/docci" \
    --retrieval-urban-1k --urban-1k-data-root-dir "$DATAROOT/Urban1k" \
    --retrieval-dci --dci-data-root-dir "$DATAROOT/dci" \
    --retrieval-iiw --iiw-data-root-dir "$DATAROOT/imageinwords" --iiw-finegrained \
    --retrieval-sharegpt4v \
    --sharegpt4v-data-root-dir "$DATAROOT/sharegpt4v" \
    --sharegpt4v-json-1k "$DATAROOT/sharegpt4v/share-captioner_coco_lcs_sam_1246k_1107_1k.json" \
    --sharegpt4v-json-10k "$DATAROOT/sharegpt4v/share-captioner_coco_lcs_sam_1246k_1107_10k.json" \
    "$@"

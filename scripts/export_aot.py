#!/usr/bin/env python
"""Export a checkpoint as a self-contained AOT (jax.export/StableHLO)
bundle — the TPU-native --torchscript analog (reference main.py:233,
model.py:339-352). The bundle runs with only jax installed; see
colxlip_tpu/serving/aot.py for the format.

Usage:
    python scripts/export_aot.py --model ViT-B-16-colxlip \
        --checkpoint /path/checkpoints/epoch_32 --out /path/aot_bundle \
        [--platforms cpu tpu] [--static-batch 64] [--uint8-images]
"""
from __future__ import annotations

import argparse
import json


def main():
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--model", required=True)
    p.add_argument("--checkpoint", default=None,
                   help="orbax dir or .pt (default: random init, for smoke)")
    p.add_argument("--out", required=True, help="output bundle directory")
    p.add_argument("--platforms", nargs="+", default=["cpu", "tpu"])
    p.add_argument("--static-batch", type=int, default=None,
                   help="pin the batch dim (default: symbolic — any batch)")
    p.add_argument("--uint8-images", action="store_true",
                   help="image entry takes uint8 (device-side normalize)")
    p.add_argument("--force-quick-gelu", action="store_true")
    args = p.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")  # lowering is host-side
    from colxlip_tpu.factory import create_model, init_params, load_weights
    from colxlip_tpu.serving.aot import save_aot_bundle

    model, cfg = create_model(
        args.model, quick_gelu=True if args.force_quick_gelu else None)
    if args.checkpoint:
        params = load_weights(model, cfg, args.checkpoint,
                              model_name=args.model)
    else:
        print("WARNING: exporting RANDOM-INIT weights (no --checkpoint)")
        params = init_params(model, cfg)
    meta = save_aot_bundle(
        args.out, model, params, cfg, model_name=args.model,
        platforms=tuple(args.platforms), static_batch=args.static_batch,
        uint8_images=args.uint8_images)
    print(json.dumps(meta))


if __name__ == "__main__":
    main()

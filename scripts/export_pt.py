#!/usr/bin/env python
"""Convert a checkpoint trained HERE into a reference-loadable .pt file.

Inverse of the .pt import path: reads an orbax checkpoint dir (or re-wraps
an existing .pt) and writes the OpenCLIP/ColXLIP torch layout the reference
loads with factory.load_checkpoint — flat text tower, packed in_proj QKV,
Sequential token heads. Round-trip parity is pinned by
tests/test_pt_export.py (strict torch load + forward parity).

Usage:
    python scripts/export_pt.py --model ViT-B-16-colxlip \
        --checkpoint /path/checkpoints/epoch_32 --out /path/model.pt
"""
from __future__ import annotations

import argparse
import json
import os


def main():
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--model", required=True,
                   help="model config name (shapes the params template)")
    p.add_argument("--checkpoint", required=True,
                   help="orbax checkpoint dir (epoch_N) or .pt file")
    p.add_argument("--out", required=True, help="output .pt path")
    p.add_argument("--epoch", type=int, default=0)
    p.add_argument("--name", default="")
    args = p.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")  # conversion is host-side
    from colxlip_tpu.factory import create_model, load_weights
    from colxlip_tpu.training.checkpoint import save_pt_checkpoint

    model, cfg = create_model(args.model)
    params = load_weights(model, cfg, args.checkpoint, model_name=args.model)
    out = save_pt_checkpoint(args.out, params, epoch=args.epoch,
                             name=args.name or args.model)
    print(json.dumps({"out": out,
                      "bytes": os.path.getsize(out)}))


if __name__ == "__main__":
    main()

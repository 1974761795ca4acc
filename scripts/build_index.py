#!/usr/bin/env python
"""Build / query a late-interaction retrieval index from an image folder.

Build: encode every image under --images with the vision tower (eval
transform, local-device-sharded batches) and write a
``colxlip_tpu.serving.index`` dir. Query: load the index and run the
two-stage (global shortlist -> MaxSim rerank) search for text queries —
the same index the serving server exposes via POST /v1/search (--index).

Usage (TPU):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/build_index.py build \
      --model ViT-B-16-colxlip --checkpoint /path/ckpt.pt \
      --images /data/corpus --out /data/corpus.index
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/build_index.py search \
      --model ViT-B-16-colxlip --checkpoint /path/ckpt.pt \
      --index /data/corpus.index --query "a dog catching a frisbee" -k 10
"""
from __future__ import annotations

import argparse
import json
import os
import sys

_EXTS = (".jpg", ".jpeg", ".png", ".webp", ".bmp")


def _build_model(args):
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/root/.jax_cache"))
    from colxlip_tpu.factory import create_model, init_params, load_weights

    model, cfg = create_model(args.model)
    if args.checkpoint:
        params = load_weights(model, cfg, args.checkpoint,
                              model_name=args.model)
    else:
        print("WARNING: random-init weights (no --checkpoint)",
              file=sys.stderr)
        params = init_params(model, cfg)
    return model, cfg, params


def cmd_build(args) -> None:
    from PIL import Image

    from colxlip_tpu.data.transforms import image_transform
    from colxlip_tpu.serving.index import build_image_index

    model, cfg, params = _build_model(args)
    transform = image_transform(cfg.vision_cfg.image_size, is_train=False)

    paths = sorted(
        os.path.join(r, f)
        for r, _, files in os.walk(args.images)
        for f in files if f.lower().endswith(_EXTS)
    )
    if not paths:
        raise SystemExit(f"no images under {args.images}")

    def gen():
        for p in paths:
            try:
                with Image.open(p) as img:
                    yield transform(img)
            except Exception as e:  # noqa: BLE001 — skip unreadable files
                print(f"skip {p}: {e}", file=sys.stderr)
                yield None

    # filter failures while keeping ids aligned
    imgs, ids = [], []
    for p, arr in zip(paths, gen()):
        if arr is not None:
            imgs.append(arr)
            ids.append(os.path.relpath(p, args.images))
    out = build_image_index(
        model, params, imgs, args.out, ids=ids,
        batch_size=args.batch_size, model_name=args.model,
    )
    print(json.dumps({"index": out, "items": len(ids)}))


def cmd_search(args) -> None:
    import jax
    import numpy as np

    from colxlip_tpu.data.tokenizer import get_tokenizer_cached
    from colxlip_tpu.serving.index import RetrievalIndex

    model, cfg, params = _build_model(args)
    idx = RetrievalIndex(args.index)
    tok = get_tokenizer_cached(cfg.text_cfg.context_length)
    tokens = np.asarray(tok([args.query]), np.int32)
    out = jax.jit(lambda p, t: model.apply(
        p, text=t, method=lambda m, text: m.encode_text(text, normalize=True)
    ))(params, tokens)
    pooled, q_tokens = (out if isinstance(out, tuple) else (out, None))
    top, scores, ids = idx.search(
        np.asarray(pooled, np.float32),
        None if q_tokens is None else np.asarray(q_tokens, np.float32),
        k=args.k, shortlist=args.shortlist, scoring=args.scoring,
        alpha=args.alpha,
    )
    for rank, (i, s) in enumerate(zip(top[0], scores[0]), 1):
        name = ids[0][rank - 1] if ids else int(i)
        print(f"{rank:3d}  {s:8.3f}  {name}")


def main():
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    sub = p.add_subparsers(dest="cmd", required=True)
    for name, fn in (("build", cmd_build), ("search", cmd_search)):
        sp = sub.add_parser(name)
        sp.set_defaults(fn=fn)
        sp.add_argument("--model", default="ViT-B-16-colxlip")
        sp.add_argument("--checkpoint", default=None)
        if name == "build":
            sp.add_argument("--images", required=True)
            sp.add_argument("--out", required=True)
            sp.add_argument("--batch-size", type=int, default=256)
        else:
            sp.add_argument("--index", required=True)
            sp.add_argument("--query", required=True)
            sp.add_argument("-k", type=int, default=10)
            sp.add_argument("--shortlist", type=int, default=100)
            sp.add_argument("--scoring", default="maxsim",
                            choices=["global", "maxsim", "mixed"])
            sp.add_argument("--alpha", type=float, default=0.5)
    args = p.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Caption images with a CoCa checkpoint (serving/generate.py decode loop).

Usage:
    PYTHONPATH=/root/repo[:/root/.axon_site] python scripts/generate_captions.py \
        --model coca-S-test --checkpoint /path/to/ckpt \
        --images img1.jpg img2.jpg [--method top_k --temperature 0.7]

Counterpart of open_clip's CoCa.generate surface (the reference inherits it
and never wires a CLI); runs on CPU or TPU.
"""
from __future__ import annotations

import argparse
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="coca-S-test")
    p.add_argument("--checkpoint", default=None,
                   help=".pt or orbax checkpoint; random init if omitted")
    p.add_argument("--images", nargs="+", required=True)
    p.add_argument("--method", default="greedy",
                   choices=["greedy", "top_k", "top_p"])
    p.add_argument("--top-k", type=int, default=50)
    p.add_argument("--top-p", type=float, default=0.9)
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--max-len", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/root/.jax_cache"))
    import numpy as np
    from PIL import Image

    from colxlip_tpu.data.tokenizer import SimpleTokenizer
    from colxlip_tpu.data.transforms import image_transform
    from colxlip_tpu.factory import create_model, init_params, load_weights
    from colxlip_tpu.serving.generate import generate_captions, tokens_to_text

    model, cfg = create_model(args.model)
    if args.checkpoint:
        params = load_weights(model, cfg, args.checkpoint,
                              model_name=args.model)
    else:
        params = init_params(model, cfg, seed=args.seed)

    size = cfg.vision_cfg.image_size
    size = size if isinstance(size, int) else size[0]
    transform = image_transform(size, is_train=False,
                                mean=cfg.vision_cfg.image_mean,
                                std=cfg.vision_cfg.image_std)
    batch = np.stack([np.asarray(transform(Image.open(f)))
                      for f in args.images])

    tokens = generate_captions(
        model, params, batch, max_len=args.max_len, method=args.method,
        top_k=args.top_k, top_p=args.top_p, temperature=args.temperature,
        rng=jax.random.PRNGKey(args.seed))
    tok = SimpleTokenizer(context_length=cfg.text_cfg.context_length)
    for path, caption in zip(args.images, tokens_to_text(tokens, tok)):
        print(f"{path}\t{caption}")


if __name__ == "__main__":
    main()

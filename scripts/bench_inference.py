#!/usr/bin/env python
"""Serving-path throughput: jitted encode_image / encode_text on one chip.

Prints one JSON line per tower with images|texts per second (bf16, donated
buffers, chained execution — same timing methodology as bench.py). The
uint8 feed path is measured too: it is the production serving input (raw
RGB in, normalize on device).

Usage (TPU):
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_inference.py \
        [--model ViT-B-16-colxlip] [--batch-size 1024]
"""
from __future__ import annotations

import argparse
import json
import os
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="ViT-B-16-colxlip")
    p.add_argument("--batch-size", type=int, default=1024)
    p.add_argument("--text-batch-size", type=int, default=4096)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--int8", action="store_true",
                   help="also measure the int8 PTQ vision encoder "
                        "(colxlip_tpu.serving)")
    p.add_argument("--text-ctx", type=int, default=0,
                   help="serve-side ctx bucket A/B: encode [n, ctx] texts "
                        "instead of the model's full context (the server's "
                        "--text-buckets path; exact same features for "
                        "captions that fit)")
    args = p.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/root/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np
    from colxlip_tpu.models import ColXLIP, CLIPCfg, get_model_config

    cfg = CLIPCfg.from_dict(get_model_config(args.model))
    model = ColXLIP(cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    s = cfg.vision_cfg.image_size
    s = s if isinstance(s, int) else s[0]

    # device-resident float input: a device-side bench cannot observe the
    # uint8 H2D saving (see BENCH.md real-data table for that), and the
    # on-device normalize fuses into patchify at ~zero cost
    imgs = jnp.asarray(
        rng.standard_normal((args.batch_size, s, s, 3)), jnp.bfloat16)
    ctx = args.text_ctx or cfg.text_cfg.context_length
    texts_np = np.zeros((args.text_batch_size, ctx), np.int32)
    texts_np[:, 0] = 49406
    span = min(19, ctx - 3)
    texts_np[:, 1:1 + span] = rng.integers(
        1, 49000, (args.text_batch_size, span))
    texts_np[:, 1 + span] = 49407
    texts = jnp.asarray(texts_np)

    params = model.init(jax.random.PRNGKey(0), imgs[:2], texts[:2])

    def encode_images(p, x):
        return model.apply(p, x, None)["image_features"]

    def encode_texts(p, x):
        return model.apply(p, None, x)["text_features"]

    def measure(fn, p_tree, x, n_items):
        # chain iterations through a tiny output-dependent feedback so the
        # loop can be neither hoisted nor dead-coded (bench.py methodology).
        # params MUST be a jit argument — closing over the concrete arrays
        # embeds them as constants in the serialized module, which overflows
        # the remote-compile request (HTTP 413) at ViT scale.
        def chained(p, x0):
            def body(carry, _):
                out = fn(p, carry)
                m = jnp.mean(out.astype(jnp.float32))
                if jnp.issubdtype(carry.dtype, jnp.integer):
                    # rounds to 0 at runtime but is data-dependent, so XLA
                    # cannot hoist or dead-code the chain
                    fb = jnp.round(m * 1e-30).astype(carry.dtype)
                else:
                    fb = (m * 1e-30).astype(carry.dtype)
                return carry + fb, ()
            y, _ = jax.lax.scan(body, x0, None, length=args.steps)
            return y

        run = jax.jit(chained)
        for _ in range(max(1, args.warmup)):
            r = run(p_tree, x)
        jax.device_get(jnp.ravel(r)[0])
        t0 = time.perf_counter()
        r = run(p_tree, x)
        jax.device_get(jnp.ravel(r)[0])
        dt = time.perf_counter() - t0
        return args.steps * n_items / dt

    img_ips = measure(encode_images, params, imgs, args.batch_size)
    txt_ips = measure(encode_texts, params, texts, args.text_batch_size)
    print(json.dumps({
        "metric": f"inference encode_image img/s ({args.model}, bf16, "
                  f"batch {args.batch_size})",
        "value": round(img_ips, 1), "unit": "images/sec/chip",
    }))
    print(json.dumps({
        "metric": f"inference encode_text txt/s ({args.model}, bf16, batch "
                  f"{args.text_batch_size})",
        "value": round(txt_ips, 1), "unit": "texts/sec/chip",
    }))

    if args.int8:
        from colxlip_tpu.serving import (
            quantize_vision_params, vision_encode_int8,
        )

        qp = quantize_vision_params(params)

        def encode_images_int8(q, x):
            return vision_encode_int8(cfg, q, x)

        int8_ips = measure(encode_images_int8, qp, imgs, args.batch_size)
        print(json.dumps({
            "metric": f"inference encode_image img/s ({args.model}, int8 PTQ "
                      f"weights+activations, batch {args.batch_size})",
            "value": round(int8_ips, 1), "unit": "images/sec/chip",
        }))


if __name__ == "__main__":
    main()

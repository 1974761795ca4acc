#!/usr/bin/env python
"""Isolate the real-data feed bottleneck: measure (a) relay H2D bandwidth for
a uint8 image batch, (b) the device step time with device-resident uint8
inputs, (c) the throughput when H2D is enqueued while the step runs.

The packed-shard soak measured ~150 img/s steady with data_time ~0.3s but
batch_time ~1.8s (batch 256 ViT-B/16 whose synthetic bound is ~0.32s/step):
either H2D over the relay is the binding constraint or the chip was
contended. This probe separates them with no input pipeline at all.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--skip-step", action="store_true",
                   help="H2D measurements only (no model compile)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    dev = jax.devices()[0]
    print("device:", dev, flush=True)

    B = args.batch_size
    batches = [
        np.random.default_rng(i).integers(0, 255, (B, 224, 224, 3), np.uint8)
        for i in range(args.iters)
    ]
    nbytes = batches[0].nbytes

    # (a) pure H2D: device_put + block, fresh array each time (no dedup)
    jax.device_put(batches[0], dev).block_until_ready()
    t0 = time.perf_counter()
    for b_np in batches:
        jax.device_put(b_np, dev).block_until_ready()
    dt = (time.perf_counter() - t0) / args.iters
    print(f"H2D uint8 [{B},224,224,3] = {nbytes/1e6:.1f} MB: "
          f"{dt*1e3:.1f} ms/batch = {nbytes/dt/1e6:.1f} MB/s", flush=True)

    t_np = np.random.default_rng(0).integers(0, 49000, (B, 77)).astype(np.int32)
    t_np[:, 0] = 49406
    t_np[:, 20] = 49407
    t0 = time.perf_counter()
    for _ in range(args.iters):
        jax.device_put(t_np, dev).block_until_ready()
    dt_t = (time.perf_counter() - t0) / args.iters
    print(f"H2D texts [{B},77] int32: {dt_t*1e3:.2f} ms", flush=True)
    if args.skip_step:
        return 0

    # (b) the real train step on device-resident uint8 input
    from colxlip_tpu.models import ColXLIP, CLIPCfg, get_model_config
    from colxlip_tpu.parallel.train_step import (
        TrainStepConfig, init_train_state, make_train_step,
    )
    from colxlip_tpu.training.optim import create_optimizer

    cfg = CLIPCfg.from_dict(get_model_config("ViT-B-16-colxlip"))
    model = ColXLIP(cfg, dtype=jnp.bfloat16)
    tx = create_optimizer(1e-4, weight_decay=0.2)
    texts = jnp.asarray(t_np)
    state = init_train_state(
        model, tx, jax.random.PRNGKey(0), batches[0][:2], texts[:2])
    step = make_train_step(model, tx, TrainStepConfig(loss_type="colclip"),
                           donate=True)

    imgs_d = jax.device_put(batches[0], dev)
    state, metrics = step(state, imgs_d, texts)
    state, metrics = step(state, imgs_d, texts)
    jax.device_get(metrics["total_loss"])
    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, metrics = step(state, imgs_d, texts)
    jax.device_get(metrics["total_loss"])
    dt_s = (time.perf_counter() - t0) / args.iters
    print(f"step, device-resident uint8 input: {dt_s*1e3:.1f} ms = "
          f"{B/dt_s:.1f} img/s", flush=True)

    # (c) ship a fresh host batch each step (the driver's feed pattern:
    # device_put happens on the prefetch thread, step consumes it)
    t0 = time.perf_counter()
    nxt = jax.device_put(batches[0], dev)
    for i in range(args.iters):
        cur = nxt
        nxt = jax.device_put(batches[(i + 1) % args.iters], dev)
        state, metrics = step(state, cur, texts)
    jax.device_get(metrics["total_loss"])
    dt_o = (time.perf_counter() - t0) / args.iters
    print(f"step + fresh H2D each iter: {dt_o*1e3:.1f} ms = "
          f"{B/dt_o:.1f} img/s", flush=True)
    print(f"summary: h2d={dt*1e3:.0f}ms step={dt_s*1e3:.0f}ms "
          f"shipped={dt_o*1e3:.0f}ms "
          f"(ideal overlap = max(h2d, step) = {max(dt, dt_s)*1e3:.0f}ms)",
          flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

#!/usr/bin/env python
"""Bisect WHAT makes device_put slow: fresh process = 72ms/38.5MB; after
model init + train steps = ~950ms. Measure H2D at each lifecycle stage and
across transfer sizes/dtypes."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def h2d(dev, arrs, label):
    import jax
    t0 = time.perf_counter()
    for a in arrs:
        jax.device_put(a, dev).block_until_ready()
    dt = (time.perf_counter() - t0) / len(arrs)
    mb = arrs[0].nbytes / 1e6
    print(f"  {label}: {dt*1e3:.1f} ms for {mb:.1f} MB = {mb/dt:.0f} MB/s",
          flush=True)
    return dt


def fresh(n, shape, dtype, seed0):
    import numpy as np
    return [np.random.default_rng(seed0 + i).integers(
        0, 255, shape, np.uint8).astype(dtype) for i in range(n)]


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    dev = jax.devices()[0]
    B = 256

    print("== stage 0: fresh process ==", flush=True)
    h2d(dev, fresh(4, (B, 224, 224, 3), np.uint8, 0), "uint8 [256,224,224,3]")
    h2d(dev, fresh(4, (B * 224 * 224 * 3,), np.uint8, 100), "uint8 flat 38.5MB")
    h2d(dev, fresh(4, (B, 224, 224, 3), np.float32, 200), "float32 154MB")

    print("== stage 1: after model params init (no compile) ==", flush=True)
    from colxlip_tpu.models import ColXLIP, CLIPCfg, get_model_config
    from colxlip_tpu.parallel.train_step import (
        TrainStepConfig, init_train_state, make_train_step,
    )
    from colxlip_tpu.training.optim import create_optimizer

    cfg = CLIPCfg.from_dict(get_model_config("ViT-B-16-colxlip"))
    model = ColXLIP(cfg, dtype=jnp.bfloat16)
    tx = create_optimizer(1e-4, weight_decay=0.2)
    t_np = np.zeros((B, 77), np.int32)
    t_np[:, 0] = 49406
    t_np[:, 1] = 49407
    texts = jnp.asarray(t_np)
    im0 = fresh(1, (B, 224, 224, 3), np.uint8, 999)[0]
    state = init_train_state(model, tx, jax.random.PRNGKey(0), im0[:2],
                             texts[:2])
    jax.block_until_ready(state.params)
    h2d(dev, fresh(4, (B, 224, 224, 3), np.uint8, 300), "uint8 img batch")

    print("== stage 2: after 1 compiled+run step ==", flush=True)
    step = make_train_step(model, tx, TrainStepConfig(loss_type="colclip"),
                           donate=True)
    imgs_d = jax.device_put(im0, dev)
    state, metrics = step(state, imgs_d, texts)
    jax.device_get(metrics["total_loss"])
    h2d(dev, fresh(4, (B, 224, 224, 3), np.uint8, 400), "uint8 img batch")

    print("== stage 3: after 4 more steps (queue drained) ==", flush=True)
    for _ in range(4):
        x = jax.device_put(fresh(1, (B, 224, 224, 3), np.uint8, 500)[0], dev)
        state, metrics = step(state, x, texts)
    jax.device_get(metrics["total_loss"])
    h2d(dev, fresh(4, (B, 224, 224, 3), np.uint8, 600), "uint8 img batch")
    h2d(dev, fresh(4, (64, 224, 224, 3), np.uint8, 700), "uint8 quarter batch")
    h2d(dev, fresh(4, (B * 224 * 224 * 3,), np.uint8, 800), "uint8 flat")
    h2d(dev, [t_np.copy() for _ in range(4)], "texts 79KB")

    print("== stage 4: del state/step, gc ==", flush=True)
    del state, step, metrics, imgs_d
    import gc
    gc.collect()
    h2d(dev, fresh(4, (B, 224, 224, 3), np.uint8, 900), "uint8 img batch")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

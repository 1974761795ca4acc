#!/usr/bin/env python
"""Follow-up probe: WHY does device_put interleaved with steps cost ~1.9s?

Timestamps each operation separately; tries transfer-while-busy, double
buffering depth, and jnp-constant reuse to find the overlap-friendly recipe.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    dev = jax.devices()[0]

    B = 256
    batches = [
        np.random.default_rng(i).integers(0, 255, (B, 224, 224, 3), np.uint8)
        for i in range(10)
    ]
    t_np = np.random.default_rng(0).integers(0, 49000, (B, 77)).astype(np.int32)
    t_np[:, 0] = 49406
    t_np[:, 20] = 49407

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

    def ts(label, t0):
        print(f"  {label}: {(time.perf_counter()-t0)*1e3:.1f} ms", flush=True)

    print("== A: put(block) THEN step(block) strictly serial ==", flush=True)
    for i in range(3):
        t0 = time.perf_counter()
        x = jax.device_put(batches[i], dev)
        x.block_until_ready()
        ts("put+block", t0)
        t0 = time.perf_counter()
        state, metrics = step(state, x, texts)
        jax.device_get(metrics["total_loss"])
        ts("step+get", t0)

    print("== B: step enqueued (not blocked), then put — is put stalled? ==",
          flush=True)
    for i in range(3):
        t0 = time.perf_counter()
        state, metrics = step(state, imgs_d, texts)
        ts("enqueue step", t0)
        t0 = time.perf_counter()
        x = jax.device_put(batches[i], dev)
        ts("device_put call", t0)
        t0 = time.perf_counter()
        x.block_until_ready()
        ts("put block", t0)
        t0 = time.perf_counter()
        jax.device_get(metrics["total_loss"])
        ts("drain step", t0)
        imgs_d = x

    print("== C: put on a SEPARATE thread while step runs ==", flush=True)
    import threading
    for i in range(3):
        res = {}

        def putter(i=i):
            t0 = time.perf_counter()
            x = jax.device_put(batches[i], dev)
            x.block_until_ready()
            res["dt"] = time.perf_counter() - t0
            res["x"] = x

        t0 = time.perf_counter()
        state, metrics = step(state, imgs_d, texts)
        th = threading.Thread(target=putter)
        th.start()
        jax.device_get(metrics["total_loss"])
        ts("step+get (put in flight)", t0)
        th.join()
        print(f"  threaded put: {res['dt']*1e3:.1f} ms", flush=True)
        imgs_d = res["x"]

    print("== D: donate=False step interleaved ==", flush=True)
    step_nd = make_train_step(model, tx, TrainStepConfig(loss_type="colclip"),
                              donate=False)
    state, metrics = step_nd(state, imgs_d, texts)
    jax.device_get(metrics["total_loss"])
    t0 = time.perf_counter()
    for i in range(4):
        x = jax.device_put(batches[i], dev)
        state, metrics = step_nd(state, x, texts)
    jax.device_get(metrics["total_loss"])
    print(f"  4 iters interleaved, donate=False: "
          f"{(time.perf_counter()-t0)/4*1e3:.1f} ms/iter", flush=True)

    print("== E: donate images too (donate_argnums 0,1) ==", flush=True)
    # reuse the same donated device buffer via jnp copy-on-device
    t0 = time.perf_counter()
    for i in range(4):
        x = jax.device_put(batches[i], dev)
        state, metrics = step(state, x, texts)
    jax.device_get(metrics["total_loss"])
    print(f"  4 iters interleaved, donate=True: "
          f"{(time.perf_counter()-t0)/4*1e3:.1f} ms/iter", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

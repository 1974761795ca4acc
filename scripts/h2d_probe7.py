#!/usr/bin/env python
"""Why did YUV420 (19.3 MB/batch vs 38.5) not ~double the relay-bound feed?

  K. post-trigger put rate of the EXACT feed shapes: [256,224,224,3] u8,
     [256,336,224] u8 (planar YUV), [256,77] i32 — fixed-cost vs rate.
  L. device decode cost: jitted yuv420 decode alone, chained in-jit.
  M. put-while-stepping: run a ViT-B-ish matmul-heavy step in a chained
     async loop and time puts issued concurrently — the rate that actually
     governs the train feed.
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
    rng = np.random.default_rng(0)

    # trigger the collapse
    jax.device_get(jax.jit(lambda x: x + 1)(jnp.ones((8, 8), jnp.float32)))

    def put(arr, label, n=3):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            jax.device_put(arr, dev).block_until_ready()
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        mb = arr.nbytes / 1e6
        print(f"  {label}: {dt*1e3:.0f} ms best for {mb:.1f} MB = "
              f"{mb/dt:.0f} MB/s", flush=True)

    print("== K: feed-shape puts, idle device ==", flush=True)
    rgb = rng.integers(0, 256, (256, 224, 224, 3), np.uint8)
    yuv = rng.integers(0, 256, (256, 336, 224), np.uint8)
    yuv_flat = np.ascontiguousarray(yuv.reshape(-1))
    txt = rng.integers(0, 49408, (256, 77)).astype(np.int32)
    put(rgb, "[256,224,224,3] u8 (38.5MB)")
    put(yuv, "[256,336,224]   u8 (19.3MB)")
    put(yuv_flat, "flat 19.3MB     u8")
    put(txt, "[256,77] i32 (0.08MB)")

    print("== L: device decode cost (chained in-jit, 32 iters) ==",
          flush=True)
    from colxlip_tpu.ops.yuv420 import decode_yuv420
    mean = (0.48145466, 0.4578275, 0.40821073)
    std = (0.26862954, 0.26130258, 0.27577711)

    @jax.jit
    def decode_loop(y):
        def body(i, acc):
            out = decode_yuv420(y, mean, std)
            return acc + out[0, 0, 0, 0] + jnp.float32(i) * 0.0
        return jax.lax.fori_loop(0, 32, body, jnp.float32(0.0))

    yd = jax.device_put(yuv, dev)
    jax.device_get(decode_loop(yd))  # compile
    t0 = time.perf_counter()
    jax.device_get(decode_loop(yd))
    dt = (time.perf_counter() - t0) / 32
    print(f"  decode_yuv420 [256,336,224]: {dt*1e3:.2f} ms/iter", flush=True)

    @jax.jit
    def norm_loop(x):
        def body(i, acc):
            out = (x.astype(jnp.float32) / 255.0 - jnp.asarray(mean)) / \
                jnp.asarray(std)
            return acc + out[0, 0, 0, 0] + jnp.float32(i) * 0.0
        return jax.lax.fori_loop(0, 32, body, jnp.float32(0.0))

    rd = jax.device_put(rgb, dev)
    jax.device_get(norm_loop(rd))
    t0 = time.perf_counter()
    jax.device_get(norm_loop(rd))
    dt = (time.perf_counter() - t0) / 32
    print(f"  u8 normalize [256,224,224,3]: {dt*1e3:.2f} ms/iter", flush=True)

    print("== M: puts while a matmul-heavy async loop runs ==", flush=True)
    w = jnp.asarray(rng.standard_normal((4096, 4096)).astype(np.float32)
                    ).astype(jnp.bfloat16)

    @jax.jit
    def burn(m):
        for _ in range(96):
            m = m @ m
        return m

    mm = burn(w)
    jax.block_until_ready(mm)   # compile+settle
    mm = burn(mm)               # ~300 ms device work, async
    t0 = time.perf_counter()
    jax.device_put(yuv, dev).block_until_ready()
    t1 = time.perf_counter()
    jax.device_put(rgb, dev).block_until_ready()
    t2 = time.perf_counter()
    jax.block_until_ready(mm)
    print(f"  yuv 19.3MB during burn: {(t1-t0)*1e3:.0f} ms = "
          f"{19.3/(t1-t0):.0f} MB/s", flush=True)
    print(f"  rgb 38.5MB during burn: {(t2-t1)*1e3:.0f} ms = "
          f"{38.5/(t2-t1):.0f} MB/s", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

#!/usr/bin/env python
"""Probe the two remaining H2D paths after the post-execution collapse
(probe4: any execution -> device_put of 38.5MB drops 737 -> ~24-40 MB/s,
fixed ~40ms/call + slow marginal rate, no recovery, no pipelining):

  F. jit-argument path: pass the fresh numpy batch directly as an argument
     to a jitted fn — PJRT Execute ships args via a different path than
     ExplicitTransfer. If this stays fast, the feed fix is "never
     device_put; always feed np arrays to the step".
  G. put-while-busy: issue a long device computation asynchronously, then
     device_put during it — does overlapping change the rate?
  H. donated-buffer refill: jit(lambda buf, x: x) with donate on buf.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fresh(n, nbytes, seed0):
    import numpy as np
    return [np.random.default_rng(seed0 + i).integers(
        0, 255, (nbytes,), np.uint8) for i in range(n)]


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    dev = jax.devices()[0]
    MB38 = 256 * 224 * 224 * 3

    # trigger the collapse
    f = jax.jit(lambda x: x + 1)
    jax.device_get(f(jnp.ones((8, 8), jnp.float32)))

    print("== reference: device_put post-trigger ==", flush=True)
    t0 = time.perf_counter()
    jax.device_put(fresh(1, MB38, 0)[0], dev).block_until_ready()
    print(f"  device_put 38.5MB: {(time.perf_counter()-t0)*1e3:.1f} ms",
          flush=True)

    print("== F: jit-argument transfer (sum to scalar, np arg) ==",
          flush=True)
    g = jax.jit(lambda x: (x[::1001].astype(jnp.int32)).sum())
    arrs = fresh(4, MB38, 100)
    jax.device_get(g(arrs[0]))  # compile
    t0 = time.perf_counter()
    for a in arrs:
        jax.device_get(g(a))
    dt = (time.perf_counter() - t0) / len(arrs)
    print(f"  jit(np arg) 38.5MB: {dt*1e3:.1f} ms avg = {38.5/dt:.0f} MB/s",
          flush=True)

    print("== G: device_put while device busy (async matmul chain) ==",
          flush=True)
    m = jnp.ones((4096, 4096), jnp.bfloat16)

    @jax.jit
    def burn(m):
        for _ in range(64):
            m = m @ m
        return m

    mm = burn(m)          # compile+run once
    jax.block_until_ready(mm)
    t0 = time.perf_counter()
    mm = burn(mm)         # async: device busy ~O(100ms+)
    t1 = time.perf_counter()
    x = jax.device_put(fresh(1, MB38, 200)[0], dev)
    x.block_until_ready()
    t2 = time.perf_counter()
    jax.block_until_ready(mm)
    t3 = time.perf_counter()
    print(f"  dispatch burn: {(t1-t0)*1e3:.1f} ms; put-during-burn: "
          f"{(t2-t1)*1e3:.1f} ms; burn drain: {(t3-t2)*1e3:.1f} ms",
          flush=True)

    print("== H: donated-buffer refill via jit ==", flush=True)
    h = jax.jit(lambda buf, x: x, donate_argnums=(0,))
    buf = jax.device_put(np.zeros(MB38, np.uint8), dev)
    buf = h(buf, fresh(1, MB38, 300)[0])
    buf.block_until_ready()
    t0 = time.perf_counter()
    for a in fresh(3, MB38, 400):
        buf = h(buf, a)
        buf.block_until_ready()
    dt = (time.perf_counter() - t0) / 3
    print(f"  donated refill 38.5MB: {dt*1e3:.1f} ms avg = {38.5/dt:.0f} MB/s",
          flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

#!/usr/bin/env python
"""Characterize the post-execution H2D collapse (probe3: 1035->24 MB/s after
the FIRST executed step, persisting after del state/step + gc).

Questions this answers:
  A. Does executing a TINY jitted fn (x+1) also trigger the collapse, or
     only the big train step?  -> relay mode switch vs memory pressure
  B. Does H2D recover after an idle sleep?  -> backoff/queue vs permanent
  C. Does jax.clear_caches() (unload executables) recover it?
  D. Post-trigger size sweep: where does the per-call stall kick in?
  E. Do N concurrent async puts pipeline (issue all, then block all)?
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


def h2d(dev, arrs, label):
    import jax
    t0 = time.perf_counter()
    for a in arrs:
        jax.device_put(a, dev).block_until_ready()
    dt = (time.perf_counter() - t0) / len(arrs)
    mb = arrs[0].nbytes / 1e6
    print(f"  {label}: {dt*1e3:.1f} ms avg for {mb:.2f} MB = {mb/dt:.0f} MB/s",
          flush=True)
    return dt


def h2d_concurrent(dev, arrs, label):
    import jax
    t0 = time.perf_counter()
    bufs = [jax.device_put(a, dev) for a in arrs]
    for b in bufs:
        b.block_until_ready()
    dt = time.perf_counter() - t0
    mb = sum(a.nbytes for a in arrs) / 1e6
    print(f"  {label}: {dt*1e3:.1f} ms total for {mb:.1f} MB "
          f"({len(arrs)} concurrent) = {mb/dt:.0f} MB/s", flush=True)
    return dt


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    dev = jax.devices()[0]
    MB38 = 256 * 224 * 224 * 3

    print("== baseline (fresh process) ==", flush=True)
    h2d(dev, fresh(3, MB38, 0), "38.5MB")

    print("== A: execute a TINY jitted fn ==", flush=True)
    f = jax.jit(lambda x: x + 1)
    y = f(jnp.ones((8, 8), jnp.float32))
    jax.device_get(y)
    h2d(dev, fresh(3, MB38, 100), "38.5MB after tiny exec")

    print("== E: concurrent puts (issue 4, then block) ==", flush=True)
    h2d_concurrent(dev, fresh(4, MB38, 200), "4x38.5MB")

    print("== D: size sweep post-trigger ==", flush=True)
    for sz, label in [(79_000, "79KB"), (256_000, "256KB"),
                      (1_000_000, "1MB"), (4_000_000, "4MB"),
                      (9_600_000, "9.6MB")]:
        h2d(dev, fresh(3, sz, 300 + sz % 997), label)

    print("== B: idle 10s then retry ==", flush=True)
    time.sleep(10)
    h2d(dev, fresh(3, MB38, 400), "38.5MB after sleep 10")

    print("== C: jax.clear_caches() then retry ==", flush=True)
    jax.clear_caches()
    del f, y
    import gc
    gc.collect()
    time.sleep(1)
    h2d(dev, fresh(3, MB38, 500), "38.5MB after clear_caches")

    print("== E2: concurrent chunked put of one batch (8x4.8MB) ==",
          flush=True)
    parts = fresh(8, MB38 // 8, 600)
    h2d_concurrent(dev, parts, "8x4.8MB")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

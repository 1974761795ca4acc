#!/usr/bin/env python
"""Is the post-execution H2D collapse (probe4/5: ~40ms + ~25ns/B all paths)
content-dependent? If the relay compresses transfers, zeros ship fast and
benchmarks with synthetic/compressible images OVERSTATE feed throughput vs
real photos.

  I. zeros vs tiled-gradient vs random uint8, 38.5MB each, post-trigger.
  J. same bytes as float32 (dtype sensitivity).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed_put(dev, arr, label, n=3):
    import jax
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.device_put(arr, dev).block_until_ready()
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    mb = arr.nbytes / 1e6
    print(f"  {label}: {dt*1e3:.1f} ms best of {n} for {mb:.1f} MB "
          f"= {mb/dt:.0f} MB/s", flush=True)


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    dev = jax.devices()[0]
    MB38 = 256 * 224 * 224 * 3

    # trigger the collapse
    jax.device_get(jax.jit(lambda x: x + 1)(jnp.ones((8, 8), jnp.float32)))

    rng = np.random.default_rng(0)
    zeros = np.zeros(MB38, np.uint8)
    rand = rng.integers(0, 255, (MB38,), np.uint8)
    # tiled gradient: structured like a synthetic image, compressible
    tile = np.arange(224, dtype=np.uint8)
    grad = np.broadcast_to(tile, (MB38 // 224, 224)).reshape(-1).copy()

    print("== I: content sensitivity (uint8, 38.5MB) ==", flush=True)
    timed_put(dev, zeros, "zeros")
    timed_put(dev, grad, "tiled gradient")
    timed_put(dev, rand, "random")

    print("== J: dtype (same bytes as float32) ==", flush=True)
    timed_put(dev, rng.standard_normal(MB38 // 4).astype(np.float32),
              "random f32")
    timed_put(dev, np.zeros(MB38 // 4, np.float32), "zeros f32")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

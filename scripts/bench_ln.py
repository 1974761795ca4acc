#!/usr/bin/env python
"""Isolated LayerNorm microbench: fused Pallas kernel vs the XLA lowering.

Times forward and forward+backward over the flagship LN shape
([256, 197, 768] bf16 — one vision-block LN at ViT-B batch 256), chained
execution (each iteration consumes the previous output) per the
docs/BENCH.md methodology.

Usage (TPU):
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_ln.py \
        [--shape 256,197,768] [--iters 50]
"""
from __future__ import annotations

import argparse
import os
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--shape", default="256,197,768")
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/root/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np
    from colxlip_tpu.ops.fused_ln import fused_layernorm, layernorm_reference

    shape = tuple(int(s) for s in args.shape.split(","))
    d = shape[-1]
    dtype = jnp.dtype(args.dtype)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape) * 2 + 0.5, dtype)
    scale = jnp.asarray(1.0 + rng.standard_normal(d) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(d) * 0.05, jnp.float32)

    nbytes = int(np.prod(shape)) * dtype.itemsize

    def timed(fn, n_reads_writes, label):
        # ALL iterations inside ONE jit (lax.fori_loop chaining the output
        # back in): a per-call host loop measures the ~55 ms relay dispatch
        # latency, not the sub-ms kernel (observed — see docs/BENCH.md).
        def body(_, z):
            out = fn(z)
            return out.astype(dtype) if out.dtype != dtype else out

        @jax.jit
        def run(z):
            # return a SCALAR: device_get of the full [B,N,D] tensor costs
            # ~5.5 s over the 14 MB/s relay and swamps the measurement
            return jnp.sum(jax.lax.fori_loop(0, args.iters, body, z)
                           .astype(jnp.float32))

        jax.block_until_ready(jax.device_get(run(x)))
        t0 = time.perf_counter()
        jax.device_get(run(x))
        dt = (time.perf_counter() - t0) / args.iters
        gbps = n_reads_writes * nbytes / dt / 1e9
        print(f"{label:28s} {dt*1e3:7.3f} ms  ({gbps:6.1f} GB/s effective)")
        return dt

    print(f"shape {shape} {args.dtype}")
    timed(lambda v: fused_layernorm(v, scale, bias), 2, "fused fwd")
    timed(lambda v: layernorm_reference(v, scale, bias), 2, "xla fwd")

    def g_fused(v):
        return jax.grad(lambda u: jnp.sum(
            fused_layernorm(u, scale, bias).astype(jnp.float32)))(v)

    def g_xla(v):
        return jax.grad(lambda u: jnp.sum(
            layernorm_reference(u, scale, bias).astype(jnp.float32)))(v)

    timed(g_fused, 4, "fused fwd+bwd (dx)")
    timed(g_xla, 4, "xla fwd+bwd (dx)")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Does int8 x int8 -> int32 dot_general beat bf16 on this chip's MXU?

VERDICT r4 #5: BENCH_r04's ceiling field says 100% MFU at bf16 = ~1196 img/s
— the 3000 img/s north star needs lower-precision MXU ops (v5e int8 peak is
~2x bf16). Before threading int8 through the MLP forward, measure the raw
matmul: if XLA doesn't emit the int8 MXU path (or the quant/dequant epilogue
eats the win), the e2e experiment is dead on arrival and this probe is the
evidence.

Loops in-jit (CLAUDE.md microbench traps: per-call host loops measure relay
dispatch; read back a scalar).
"""
import argparse
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def bench(fn, args, iters):
    """Chained in-jit loop; returns seconds per iteration.

    The feedback consumes a MEAN of the output (a slice would let XLA
    compute one row of the matmul) and the timed run uses different inputs
    than the warmup (relay re-dispatch of identical args measured
    impossibly fast — see docs/BENCH.md methodology)."""

    @jax.jit
    def loop(x, *rest):
        def body(c, _):
            out = fn(c, *rest)
            s = jnp.mean(out.astype(jnp.float32))  # forces the full output
            c = (c + (s * 0).astype(c.dtype)).astype(c.dtype)
            return c, s
        _, outs = jax.lax.scan(body, x, None, length=iters)
        return outs[-1]

    r = loop(*args)
    jax.block_until_ready(r)  # compile + warm
    # second warmup on DIFFERENT args: the first post-compile dispatch in
    # this relay absorbs queue/warmup costs (measured: the first timed leg
    # of a multi-case probe read 70-1000x slow regardless of which case ran
    # first); time the third call on fresh args
    x2 = (args[0] + jnp.ones((), args[0].dtype)).astype(args[0].dtype)
    jax.block_until_ready(x2)
    jax.device_get(loop(x2, *args[1:]))
    x3 = (x2 + jnp.ones((), x2.dtype)).astype(x2.dtype)
    jax.block_until_ready(x3)
    t0 = time.perf_counter()
    r = float(jax.device_get(loop(x3, *args[1:])))
    dt = time.perf_counter() - t0
    assert np.isfinite(r)
    return dt / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--m", type=int, default=4096)
    p.add_argument("--k", type=int, default=4096)
    p.add_argument("--n", type=int, default=4096)
    p.add_argument("--iters", type=int, default=50)
    args = p.parse_args()
    m, k, n = args.m, args.k, args.n
    flops = 2.0 * m * k * n

    rng = np.random.default_rng(0)
    x8 = jnp.asarray(rng.integers(-127, 127, (m, k), dtype=np.int8))
    w8 = jnp.asarray(rng.integers(-127, 127, (k, n), dtype=np.int8))
    xb = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32), jnp.bfloat16)
    wb = jnp.asarray(rng.standard_normal((k, n)).astype(np.float32), jnp.bfloat16)

    def dot_i8(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)

    def dot_bf16(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    def dot_i8_scaled(a, b):
        # the realistic epilogue: int32 accum -> fp32 row/col rescale
        out = dot_i8(a, b).astype(jnp.float32)
        return out * (1.0 / 127.0) * (1.0 / 127.0)

    for name, fn, a in (("bf16", dot_bf16, (xb, wb)),
                        ("int8->int32", dot_i8, (x8, w8)),
                        ("int8+rescale", dot_i8_scaled, (x8, w8))):
        s = bench(fn, a, args.iters)
        print(f"{name:14s} {s*1e3:8.3f} ms  {flops/s/1e12:7.1f} TF/s")


if __name__ == "__main__":
    main()

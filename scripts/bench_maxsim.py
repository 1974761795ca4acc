#!/usr/bin/env python
"""MaxSim streaming-path microbench: m_chunk sweep at the train shape.

Times value+grad of the streaming custom-VJP MaxSim (the 'auto' training
path, ops/maxsim.py) at the flagship colclip shape — both loss directions
(text rows vs gathered images, gathered texts vs image rows) — for a range
of text-tile sizes. Iterations are chained inside one jit (feed a scalar
back into the inputs) with a scalar readback, per the timing methodology in
docs/BENCH.md.

Usage (TPU):
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_maxsim.py \
        [--batch 256] [--steps 10] [--chunks 8 16 32 64]
"""
from __future__ import annotations

import argparse
import json
import os
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--kbatch", type=int, default=0,
                   help="key-side batch (images for the text-row direction); "
                        "0 = same as --batch. The pod-shape window is "
                        "--batch 256 --kbatch 2048 (K=8 neighborhood)")
    p.add_argument("--lt", type=int, default=77)
    p.add_argument("--li", type=int, default=196)
    p.add_argument("--dim", type=int, default=512)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--chunks", type=int, nargs="+", default=[8, 16, 32, 64])
    args = p.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/root/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np
    from colxlip_tpu.ops.maxsim import maxsim_streaming

    rng = np.random.default_rng(0)
    b, lt, li, d = args.batch, args.lt, args.li, args.dim
    kb = args.kbatch or b
    t = jnp.asarray(rng.standard_normal((b, lt, d)), jnp.bfloat16) * 0.1
    im = jnp.asarray(rng.standard_normal((kb, li, d)), jnp.bfloat16) * 0.1

    # FLOPs: fwd one sim einsum; bwd recompute + dT + dI einsums -> 4 einsums
    # of 2*M*K*Lt*Li*D. (In the single-chip train step the two loss
    # directions are identical calls and XLA CSEs them, so one direction is
    # the representative cost — the profile's ~3 TFLOP backward matches.)
    flops = 4 * 2.0 * b * kb * lt * li * d

    for mc in args.chunks:
        def loss_fn(tt, ii):
            s1 = maxsim_streaming(tt, ii, mask_mode="nonzero", m_chunk=mc)
            return jnp.mean(s1)

        grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1))

        def chained(tt, ii):
            def body(carry, _):
                ct, ci = carry
                val, (gt, gi) = grad_fn(ct, ci)
                # the feedback MUST consume the grads: with val alone, XLA
                # dead-codes the entire backward out of the scan (measured:
                # 7.9 ms/iter "510 TF/s" vs the honest 40.4 ms / 100 TF/s)
                fb = ((val + jnp.mean(gt.astype(jnp.float32))
                       + jnp.mean(gi.astype(jnp.float32))) * 1e-30
                      ).astype(ct.dtype)
                return (ct + fb, ci + fb), ()
            (yt, yi), _ = jax.lax.scan(body, (tt, ii), None, length=args.steps)
            return jnp.mean(yt.astype(jnp.float32))

        run = jax.jit(chained)
        r = run(t, im)
        jax.device_get(r)
        # timed run takes DIFFERENT inputs than the warmup: an identical
        # (executable, args) re-dispatch measured impossibly fast over the
        # relay (452+ "TF/s" — 3x the chip peak), i.e. it was not re-executed
        t2 = t + jnp.bfloat16(1e-3)
        i2 = im + jnp.bfloat16(1e-3)
        t0 = time.perf_counter()
        r = run(t2, i2)
        jax.device_get(r)
        dt = time.perf_counter() - t0
        ms = dt / args.steps * 1e3
        print(json.dumps({
            "m_chunk": mc, "ms_per_iter": round(ms, 2),
            "tflops_per_sec": round(flops / (dt / args.steps) / 1e12, 1),
        }))


if __name__ == "__main__":
    main()

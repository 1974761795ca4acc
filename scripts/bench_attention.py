#!/usr/bin/env python
"""Per-layer attention microbenchmark (fused packed-QKV kernel vs XLA).

Chained device timing (lax.scan with an output-dependent feedback — the
methodology that survived the round-2 relay-timing traps; see BENCH.md).
Run on TPU:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_attention.py
"""
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from colxlip_tpu.ops.fused_attention import fused_mha_packed, fused_mha_reference

ITERS = 20

def bench(f, qkv):
    """f: qkv -> out. Chained via a tiny mean-feedback; one dispatch."""
    def body(carry, _):
        out = f(carry)
        fb = (jnp.mean(out.astype(jnp.float32)) * 1e-30).astype(carry.dtype)
        return carry + fb, ()
    @jax.jit
    def run(q):
        q, _ = jax.lax.scan(body, q, None, length=ITERS)
        return q
    r = run(qkv); jax.device_get(r.reshape(-1)[0])
    t0 = time.perf_counter()
    r = run(qkv); jax.device_get(r.reshape(-1)[0])
    return (time.perf_counter() - t0) / ITERS * 1e3

rng = np.random.default_rng(0)
for name, b, n, heads, hd, causal in [("vision", 256, 197, 12, 768, False),
                                      ("text  ", 256, 77, 8, 512, True)]:
    qkv = jnp.asarray(rng.standard_normal((b, n, 3 * hd)) * 0.05, jnp.bfloat16)
    co = jnp.asarray(rng.standard_normal((b, n, hd)) * 0.05, jnp.bfloat16)

    def mk(f):
        fwd = lambda x: f(x, heads, causal)
        grad = jax.grad(lambda y: jnp.sum(fwd(y).astype(jnp.float32) * co.astype(jnp.float32)))
        return fwd, grad

    for label, f in [("fused", fused_mha_packed), ("xlref", fused_mha_reference)]:
        fwd, grad = mk(f)
        tf = bench(fwd, qkv)
        tg = bench(grad, qkv)
        print(f"{name} {label}: fwd {tf:7.2f} ms   grad {tg:7.2f} ms", flush=True)

    # the model's current path for comparison (q,k,v split outside)
    if name.startswith("vision"):
        d = hd // heads
        def dpa(x):
            q, k, v = jnp.split(x, 3, axis=-1)
            q = q.reshape(b, n, heads, d); k = k.reshape(b, n, heads, d); v = v.reshape(b, n, heads, d)
            return jax.nn.dot_product_attention(q, k, v).reshape(b, n, hd)
        tg = bench(jax.grad(lambda y: jnp.sum(dpa(y).astype(jnp.float32) * co.astype(jnp.float32))), qkv)
        print(f"{name} jax.nn.dpa: fwd {bench(dpa, qkv):7.2f} ms   grad {tg:7.2f} ms", flush=True)

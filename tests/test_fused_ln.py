"""Fused LayerNorm kernel: interpret-mode parity vs the XLA reference."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from colxlip_tpu.ops.fused_ln import (
    fused_layernorm, fused_ln_supported, layernorm_reference, resolve_ln_impl,
)


def _setup(rng, shape=(4, 24, 128), dtype=jnp.float32, scale_mag=1.0):
    x = jnp.asarray(rng.standard_normal(shape) * 2 + 0.5, dtype)
    d = shape[-1]
    scale = jnp.asarray(1.0 + rng.standard_normal(d) * 0.1 * scale_mag,
                        jnp.float32)
    bias = jnp.asarray(rng.standard_normal(d) * 0.05, jnp.float32)
    return x, scale, bias


def test_forward_matches_reference(rng):
    x, scale, bias = _setup(rng)
    out = fused_layernorm(x, scale, bias, 1e-5, 0, True)
    want = layernorm_reference(x, scale, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_forward_multiblock_grid(rng):
    # rows not a multiple of the biggest candidate block: exercises >1 grid
    # step and the block_r picker (R = 36 -> br = 4, 9 grid steps)
    x, scale, bias = _setup(rng, shape=(36, 128))
    out = fused_layernorm(x, scale, bias, 1e-5, 0, True)
    want = layernorm_reference(x, scale, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_vjp_matches_reference(rng):
    x, scale, bias = _setup(rng)

    def loss_k(x, s, b):
        return jnp.sum(jnp.sin(fused_layernorm(x, s, b, 1e-5, 0, True)))

    def loss_r(x, s, b):
        return jnp.sum(jnp.sin(layernorm_reference(x, s, b)))

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(x, scale, bias)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(x, scale, bias)
    for a, b, name in zip(gk, gr, ["dx", "dgamma", "dbeta"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-4, err_msg=name)


def test_vjp_accumulates_across_blocks(rng):
    # dgamma/dbeta accumulate across sequential grid steps; force 3 blocks
    x, scale, bias = _setup(rng, shape=(24, 128))

    def loss_k(x, s, b):
        return jnp.sum(fused_layernorm(x, s, b, 1e-5, 8, True) ** 2)

    def loss_r(x, s, b):
        return jnp.sum(layernorm_reference(x, s, b) ** 2)

    gk = jax.grad(loss_k, argnums=(1, 2))(x, scale, bias)
    gr = jax.grad(loss_r, argnums=(1, 2))(x, scale, bias)
    for a, b, name in zip(gk, gr, ["dgamma", "dbeta"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-4, err_msg=name)


def test_bf16_stream_fp32_stats(rng):
    # bf16 x: fused output must match the fp32-stats reference computed on
    # the SAME bf16 input (LayerNormFp32 semantics), to fp32 accumulation
    # noise only — and grads come back in bf16
    x, scale, bias = _setup(rng, dtype=jnp.bfloat16)
    out = fused_layernorm(x, scale, bias, 1e-5, 0, True)
    assert out.dtype == jnp.bfloat16
    want = layernorm_reference(x, scale, bias)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(want, np.float32), atol=2e-2)
    dx = jax.grad(lambda v: jnp.sum(
        fused_layernorm(v, scale, bias, 1e-5, 0, True).astype(jnp.float32)))(x)
    assert dx.dtype == jnp.bfloat16


def test_supported_gate():
    assert not fused_ln_supported((4, 24, 100), "tpu")    # lane not 128-mult
    assert not fused_ln_supported((4, 24, 128), "cpu")    # not TPU
    assert fused_ln_supported((4, 24, 256), "tpu")


def test_env_dispatch(monkeypatch):
    assert resolve_ln_impl() == "xla"
    monkeypatch.setenv("COLXLIP_LN_IMPL", "fused")
    assert resolve_ln_impl() == "fused"
    assert resolve_ln_impl("xla") == "xla"  # explicit beats env


def test_layernorm_module_fused_gate_cpu(monkeypatch, rng):
    # On a CPU backend the module must keep the XLA path even when the env
    # asks for fused (fused_ln_supported gates on backend)
    from colxlip_tpu.models.layers import LayerNorm

    monkeypatch.setenv("COLXLIP_LN_IMPL", "fused")
    ln = LayerNorm()
    x = jnp.asarray(rng.standard_normal((2, 8, 128)), jnp.float32)
    params = ln.init(jax.random.PRNGKey(0), x)
    y = ln.apply(params, x)
    want = layernorm_reference(
        x, params["params"]["scale"], params["params"]["bias"])
    np.testing.assert_allclose(np.asarray(y), np.asarray(want), atol=1e-6)

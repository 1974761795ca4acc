"""Int8 quantization op tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from colxlip_tpu.ops.quantization import (
    dequantize_int8,
    int8_matmul,
    quantize_int8_pallas,
    quantize_int8_xla,
    quantize_params_int8,
)


def test_xla_quant_roundtrip(rng):
    w = jnp.asarray(rng.standard_normal((64, 32)).astype(np.float32))
    q, scale = quantize_int8_xla(w)
    assert q.dtype == jnp.int8
    assert scale.shape == (1, 32)
    back = np.asarray(dequantize_int8(q, scale, jnp.float32))
    err = np.abs(back - np.asarray(w)).max()
    # max error bounded by half a quantization step per channel
    step = np.asarray(scale)[0]
    assert (np.abs(back - np.asarray(w)) <= step[None, :] * 0.51).all()
    assert err < 0.05


@pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="pltpu.prng_seed has no CPU interpreter lowering in this jax",
)
def test_pallas_quant_close_to_xla(rng):
    w = jnp.asarray(rng.standard_normal((64, 128)).astype(np.float32))
    q_p, s_p = quantize_int8_pallas(w, seed=0, interpret=True)
    q_x, s_x = quantize_int8_xla(w)
    np.testing.assert_allclose(np.asarray(s_p)[0], np.asarray(s_x)[0], rtol=1e-6)
    # stochastic rounding differs from round-to-nearest by at most 1 step
    assert np.abs(np.asarray(q_p, np.int32) - np.asarray(q_x, np.int32)).max() <= 1


def test_int8_matmul_close(rng):
    x = jnp.asarray(rng.standard_normal((8, 64)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((64, 32)).astype(np.float32))
    q, scale = quantize_int8_xla(w)
    got = np.asarray(int8_matmul(x, q, scale), np.float32)
    want = np.asarray(x) @ np.asarray(w)
    rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-6)
    assert rel < 0.05, rel


def test_quantize_params_tree():
    params = {
        "big": jnp.ones((512, 512)),
        "small": jnp.ones((4, 4)),
        "vec": jnp.ones((512,)),
    }
    out = quantize_params_int8(params)
    assert set(out["big"]) == {"int8", "scale"}
    assert out["small"].shape == (4, 4)  # untouched
    assert out["vec"].shape == (512,)


def test_int8_st_linear_forward_close_and_backward_exact(rng):
    """int8_st_linear: forward within int8 noise of the fp matmul; backward
    EXACTLY the straight-through fp gradients (quantization is fwd-only)."""
    from colxlip_tpu.ops.quantization import int8_st_linear

    x = jnp.asarray(rng.standard_normal((4, 6, 64)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((64, 32)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((32,)).astype(np.float32))
    got = np.asarray(int8_st_linear(x, w, b), np.float32)
    want = np.asarray(x) @ np.asarray(w) + np.asarray(b)
    rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-6)
    assert rel < 0.05, rel

    def f_q(x_, w_, b_):
        return (int8_st_linear(x_, w_, b_) ** 2).sum()

    def f_fp(x_, w_, b_):
        return ((x_ @ w_ + b_) ** 2).sum()

    g_q = jax.grad(f_q, argnums=(0, 1, 2))(x, w, b)
    # straight-through: the backward treats the quantized output as if it
    # were the fp one, so grads differ from fp ONLY via the incoming
    # cotangent (here: the quantized y in the chain) — check the linear map
    # itself by feeding an identical cotangent through jax.vjp
    y_q, vjp_q = jax.vjp(lambda a, k, c: int8_st_linear(a, k, c), x, w, b)
    y_fp, vjp_fp = jax.vjp(lambda a, k, c: a @ k + c, x, w, b)
    ct = jnp.asarray(rng.standard_normal(y_q.shape).astype(np.float32))
    for a, b_ in zip(vjp_q(ct), vjp_fp(ct)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-4)
    assert all(np.isfinite(np.asarray(g)).all() for g in g_q)


def test_mlp_int8_env_knob(rng, monkeypatch):
    """COLXLIP_MLP_INT8=fwd: same param tree, output close to the fp MLP."""
    from colxlip_tpu.models.layers import MLP

    x = jnp.asarray(rng.standard_normal((2, 8, 64)).astype(np.float32))
    mlp = MLP(dim=64, dtype=jnp.float32)
    params = mlp.init(jax.random.PRNGKey(0), x)
    y_fp = np.asarray(mlp.apply(params, x), np.float32)
    monkeypatch.setenv("COLXLIP_MLP_INT8", "fwd")
    params_q = mlp.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(params_q) == \
        jax.tree_util.tree_structure(params)
    y_q = np.asarray(mlp.apply(params, x), np.float32)
    rel = np.abs(y_q - y_fp).max() / (np.abs(y_fp).max() + 1e-6)
    assert rel < 0.1, rel

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

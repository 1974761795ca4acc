"""int8 PTQ serving path: feature agreement with the bf16/fp32 model."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from colxlip_tpu.models import CLIP, CLIPCfg, get_model_config
from colxlip_tpu.serving import quantize_vision_params, vision_encode_int8


@pytest.fixture(scope="module")
def model_and_params():
    cfg = CLIPCfg.from_dict(get_model_config("ViT-S-16-test"))
    model = CLIP(cfg, dtype=jnp.float32)
    s = cfg.vision_cfg.image_size
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((2, s, s, 3)), jnp.float32)
    txt = np.zeros((2, cfg.text_cfg.context_length), np.int32)
    txt[:, 0] = 49406
    txt[:, 1] = 49407
    params = model.init(jax.random.PRNGKey(0), img, jnp.asarray(txt))
    return cfg, model, params, img


def test_int8_features_close_to_fp32(model_and_params):
    cfg, model, params, img = model_and_params
    ref = model.apply(params, img, None)["image_features"]
    qp = quantize_vision_params(params)
    got = vision_encode_int8(cfg, qp, img)
    cos = jnp.sum(ref.astype(jnp.float32) * got, axis=-1)
    # both outputs are l2-normalized; int8 PTQ should keep cosine > 0.99
    assert float(jnp.min(cos)) > 0.99, np.asarray(cos)


def test_int8_uint8_input(model_and_params):
    cfg, model, params, img = model_and_params
    qp = quantize_vision_params(params)
    u8 = np.asarray(
        np.clip((np.asarray(img) * 0.2 + 0.5) * 255, 0, 255), np.uint8)
    out = vision_encode_int8(cfg, qp, jnp.asarray(u8))
    assert out.shape == (2, cfg.embed_dim)
    assert np.isfinite(np.asarray(out)).all()
    # normalized output
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out), axis=-1), 1.0, atol=1e-5)


def test_int8_weight_roundtrip():
    from colxlip_tpu.serving.int8 import _quant_weight

    rng = np.random.default_rng(1)
    w = rng.standard_normal((64, 32)).astype(np.float32)
    qw = _quant_weight(jnp.asarray(w))
    deq = np.asarray(qw["q"], np.float32) * np.asarray(qw["scale"])[None, :]
    # per-channel symmetric int8: worst-case error is scale/2 per element
    assert np.abs(deq - w).max() <= np.asarray(qw["scale"]).max() * 0.5 + 1e-6


def test_int8_text_features_close_to_fp32(model_and_params):
    from colxlip_tpu.serving import quantize_text_params, text_encode_int8

    cfg, model, params, img = model_and_params
    rng = np.random.default_rng(1)
    txt = np.zeros((4, cfg.text_cfg.context_length), np.int32)
    txt[:, 0] = 49406
    for r in range(4):
        ln = rng.integers(3, cfg.text_cfg.context_length - 1)
        txt[r, 1:ln] = rng.integers(1, 49000, ln - 1)
        txt[r, ln] = 49407
    txt = jnp.asarray(txt)
    ref = model.apply(params, None, txt)["text_features"]
    qp = quantize_text_params(params)
    got = text_encode_int8(cfg, qp, txt)
    cos = jnp.sum(ref.astype(jnp.float32) * got, axis=-1)
    assert float(jnp.min(cos)) > 0.99, np.asarray(cos)


def test_int8_text_rejects_nonstandard(model_and_params):
    import dataclasses

    from colxlip_tpu.serving import quantize_text_params, text_encode_int8

    cfg, model, params, img = model_and_params
    tcfg = dataclasses.replace(cfg.text_cfg, pool_type="last")
    bad = dataclasses.replace(cfg, text_cfg=tcfg)
    qp = quantize_text_params(params)
    with pytest.raises(NotImplementedError):
        text_encode_int8(bad, qp, jnp.zeros((1, 8), jnp.int32))

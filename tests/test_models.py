"""Model tower shape/behavior tests (tiny config; CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from colxlip_tpu.models import (
    CLIP,
    CLIPCfg,
    ColXLIP,
    get_model_config,
    list_models,
)

from oracles import np_eot_mask_tokens

EOT = 49407
SOT = 49406


@pytest.fixture(scope="module")
def tiny_cfg():
    return CLIPCfg.from_dict(get_model_config("ViT-S-16-test"))


@pytest.fixture(scope="module")
def tiny_model(tiny_cfg):
    model = ColXLIP(tiny_cfg, dtype=jnp.float32)
    img = jnp.zeros((2, 64, 64, 3))
    txt = _text_batch(np.random.default_rng(1), 2, 32)
    params = model.init(jax.random.PRNGKey(0), img, txt)
    return model, params


def _text_batch(rng, b, n):
    ids = rng.integers(1, 1000, (b, n))
    lengths = rng.integers(3, n - 1, b)
    for r in range(b):
        ids[r, 0] = SOT
        ids[r, lengths[r]] = EOT
        ids[r, lengths[r] + 1:] = 0
    return jnp.asarray(ids.astype(np.int32))


def test_registry_contains_standard_configs():
    models = list_models()
    for name in ("ViT-B-16", "ViT-B-32", "ViT-B-16-colxlip", "ViT-B-32-colxlip"):
        assert name in models


def test_colxlip_forward_shapes(tiny_model, tiny_cfg):
    model, params = tiny_model
    img = jnp.ones((3, 64, 64, 3)) * 0.1
    txt = _text_batch(np.random.default_rng(2), 3, 32)
    out = model.apply(params, img, txt)
    d = tiny_cfg.embed_dim
    assert out["image_features"].shape == (3, d)
    assert out["text_features"].shape == (3, d)
    assert out["token_image_features"].shape == (3, 16, d)  # (64/16)^2 patches
    assert out["token_text_features"].shape == (3, 32, d)
    assert out["logit_scale"].shape == ()
    np.testing.assert_allclose(
        float(out["logit_scale"]), np.exp(np.log(1 / 0.07)), rtol=1e-5
    )


def test_features_are_normalized(tiny_model):
    model, params = tiny_model
    img = jnp.ones((2, 64, 64, 3)) * 0.3
    txt = _text_batch(np.random.default_rng(3), 2, 32)
    out = model.apply(params, img, txt)
    for key in ("image_features", "text_features"):
        norms = np.linalg.norm(np.asarray(out[key]), axis=-1)
        np.testing.assert_allclose(norms, 1.0, rtol=1e-4)
    tok_norms = np.linalg.norm(np.asarray(out["token_image_features"]), axis=-1)
    np.testing.assert_allclose(tok_norms, 1.0, rtol=1e-4)


def test_text_pooling_uses_eot_position(tiny_model):
    """Changing tokens after EOT must not change pooled text features
    (causal attention + argmax pooling), reference transformer.py:849-851."""
    model, params = tiny_model
    rng = np.random.default_rng(4)
    txt = _text_batch(rng, 2, 32)
    out1 = model.apply(params, text=txt)
    txt2 = np.asarray(txt).copy()
    eot_pos = txt2.argmax(axis=-1)
    for r in range(2):
        if eot_pos[r] + 2 < 32:
            txt2[r, eot_pos[r] + 2] = 777  # after EOT, should be invisible
    out2 = model.apply(params, text=jnp.asarray(txt2))
    np.testing.assert_allclose(
        np.asarray(out1["text_features"]), np.asarray(out2["text_features"]),
        rtol=1e-4, atol=1e-5,
    )


def test_eot_masking_zeroes_before_projection(tiny_model, tiny_cfg):
    """Token features at/after EOT must be the projection of the zero vector:
    identical constant embedding across positions and batch (model.py:581-593)."""
    model, params = tiny_model
    txt = _text_batch(np.random.default_rng(5), 2, 32)
    out = model.apply(params, text=txt)
    toks = np.asarray(out["token_text_features"])
    eot_pos = np.asarray(txt).argmax(axis=-1)
    # All masked positions share one constant vector
    ref_vec = toks[0, eot_pos[0]]
    for r in range(2):
        for p in range(eot_pos[r], 32):
            np.testing.assert_allclose(toks[r, p], ref_vec, rtol=1e-4, atol=1e-5)
    # Unmasked positions differ from it
    assert not np.allclose(toks[0, 1], ref_vec, atol=1e-3)


def test_plain_clip_model(tiny_cfg):
    model = CLIP(tiny_cfg, dtype=jnp.float32)
    img = jnp.ones((2, 64, 64, 3)) * 0.2
    txt = _text_batch(np.random.default_rng(6), 2, 32)
    params = model.init(jax.random.PRNGKey(0), img, txt)
    out = model.apply(params, img, txt)
    assert out["image_features"].shape == (2, tiny_cfg.embed_dim)
    assert "token_image_features" not in out


def test_bf16_compute_close_to_fp32(tiny_cfg):
    model32 = ColXLIP(tiny_cfg, dtype=jnp.float32)
    model16 = ColXLIP(tiny_cfg, dtype=jnp.bfloat16)
    img = jnp.ones((2, 64, 64, 3)) * 0.15
    txt = _text_batch(np.random.default_rng(7), 2, 32)
    params = model32.init(jax.random.PRNGKey(0), img, txt)
    o32 = model32.apply(params, img, txt)
    o16 = model16.apply(params, img, txt)
    # bf16 activations: loose tolerance, but same ballpark
    cos = np.sum(
        np.asarray(o32["image_features"]) * np.asarray(o16["image_features"], np.float32),
        axis=-1,
    )
    assert np.all(cos > 0.99)


def test_attentional_pool_vision_tower():
    import dataclasses
    from colxlip_tpu.models import CLIPVisionCfg, VisionTransformer

    cfg = CLIPVisionCfg(layers=2, width=128, head_width=32, patch_size=16,
                        image_size=64, attentional_pool=True,
                        attn_pooler_queries=8, attn_pooler_heads=4)
    tower = VisionTransformer(cfg, embed_dim=64, dtype=jnp.float32)
    img = jnp.ones((2, 64, 64, 3)) * 0.2
    params = tower.init(jax.random.PRNGKey(0), img)
    pooled, tokens = tower.apply(params, img)
    assert pooled.shape == (2, 64)
    assert tokens.shape == (2, 7, 128)  # 8 queries, tok-pool drops the first


def test_gelu_approx_close_to_exact(tiny_cfg):
    """tanh-GELU mode (the +14% fast path) stays numerically close to erf."""
    import dataclasses
    cfg_fast = dataclasses.replace(tiny_cfg, gelu_approximate=True)
    m_exact = ColXLIP(tiny_cfg, dtype=jnp.float32)
    m_fast = ColXLIP(cfg_fast, dtype=jnp.float32)
    img = jnp.ones((2, 64, 64, 3)) * 0.2
    txt = _text_batch(np.random.default_rng(9), 2, 32)
    params = m_exact.init(jax.random.PRNGKey(0), img, txt)
    o1 = m_exact.apply(params, img, txt)
    o2 = m_fast.apply(params, img, txt)
    cos = np.sum(np.asarray(o1["image_features"]) * np.asarray(o2["image_features"]), -1)
    assert np.all(cos > 0.9999), cos


def test_fast_gelu_matches_stock_value_and_grad():
    """The save-one-residual custom-VJP GELUs (round-3 flagship win: erf
    699 -> 742.6 img/s) must match jax.nn.gelu value AND grad to well below
    bf16 resolution, for both erf and tanh numerics."""
    from colxlip_tpu.models.layers import _gelu_exact_fast, _gelu_tanh_fast

    x = jnp.asarray(
        np.random.default_rng(0).standard_normal(4096).astype(np.float32)) * 3
    for fast, approx in ((_gelu_exact_fast, False), (_gelu_tanh_fast, True)):
        ref = lambda v: jax.nn.gelu(v, approximate=approx)  # noqa: E731
        assert float(jnp.max(jnp.abs(fast(x) - ref(x)))) < 3e-6
        g_fast = jax.grad(lambda v: jnp.sum(fast(v)))(x)
        g_ref = jax.grad(lambda v: jnp.sum(ref(v)))(x)
        assert float(jnp.max(jnp.abs(g_fast - g_ref))) < 1e-5
    # bf16 path: the VJP must return the input dtype
    xb = x.astype(jnp.bfloat16)
    gb = jax.grad(lambda v: jnp.sum(_gelu_exact_fast(v).astype(jnp.float32)))(xb)
    assert gb.dtype == jnp.bfloat16


def test_tanh_structured_erf_gelu_parity():
    """erf-as-tanh-of-odd-polynomial GELU (the round-3 flagship default):
    value/grad must match exact jax.nn.gelu to sub-bf16-noise, and the tanh
    must stay saturated outside the [-8, 8] fit domain (monotone-positive
    polynomial tail)."""
    from colxlip_tpu.models.layers import _gelu_exact_tanhstruct

    x = jnp.asarray(
        np.random.default_rng(1).standard_normal(8192).astype(np.float32)) * 4
    ref = lambda v: jax.nn.gelu(v, approximate=False)  # noqa: E731
    assert float(jnp.max(jnp.abs(_gelu_exact_tanhstruct(x) - ref(x)))) < 2e-6
    g_new = jax.grad(lambda v: jnp.sum(_gelu_exact_tanhstruct(v)))(x)
    g_ref = jax.grad(lambda v: jnp.sum(ref(v)))(x)
    assert float(jnp.max(jnp.abs(g_new - g_ref))) < 1e-5
    # tail: gelu(x) -> x for x >> 0, -> 0 for x << 0 (tanh saturated)
    xt = jnp.asarray([-1e4, -100.0, -12.0, 12.0, 100.0, 1e4], jnp.float32)
    np.testing.assert_allclose(
        np.asarray(_gelu_exact_tanhstruct(xt)),
        np.asarray([0.0, 0.0, 0.0, 12.0, 100.0, 1e4]), atol=1e-6)
    # bf16 path returns bf16 grads
    xb = x.astype(jnp.bfloat16)
    gb = jax.grad(
        lambda v: jnp.sum(_gelu_exact_tanhstruct(v).astype(jnp.float32)))(xb)
    assert gb.dtype == jnp.bfloat16


def test_deg9_tanh_structured_erf_gelu(monkeypatch):
    """COLXLIP_GELU_IMPL=fast9 selects the degree-9 fit (_TANH_ERF_C9):
    value/grad within its fitted bounds of exact gelu (3.4e-6 / 1.5e-5 —
    below the measured on-chip tanh precision floor), saturated tail."""
    from colxlip_tpu.models import layers

    x = jnp.asarray(
        np.random.default_rng(2).standard_normal(8192).astype(np.float32)) * 4
    monkeypatch.setenv("COLXLIP_GELU_IMPL", "fast9")
    ref = lambda v: jax.nn.gelu(v, approximate=False)  # noqa: E731
    assert float(jnp.max(jnp.abs(layers.gelu(x) - ref(x)))) < 5e-6
    g_new = jax.grad(lambda v: jnp.sum(layers.gelu(v)))(x)
    g_ref = jax.grad(lambda v: jnp.sum(ref(v)))(x)
    assert float(jnp.max(jnp.abs(g_new - g_ref))) < 2e-5
    xt = jnp.asarray([-1e4, -100.0, -12.0, 12.0, 100.0, 1e4], jnp.float32)
    np.testing.assert_allclose(
        np.asarray(layers.gelu(xt)),
        np.asarray([0.0, 0.0, 0.0, 12.0, 100.0, 1e4]), atol=1e-6)
    xb = x.astype(jnp.bfloat16)
    gb = jax.grad(
        lambda v: jnp.sum(layers.gelu(v).astype(jnp.float32)))(xb)
    assert gb.dtype == jnp.bfloat16


def test_gelu_impl_env_selects_aspoly(monkeypatch):
    """COLXLIP_GELU_IMPL=aspoly keeps the A&S-polynomial custom-VJP path
    reachable for A/B work; it and the default tanh-structured path agree to
    their combined approximation error."""
    from colxlip_tpu.models import layers

    x = jnp.linspace(-6, 6, 512)
    monkeypatch.setenv("COLXLIP_GELU_IMPL", "aspoly")
    aspoly = layers.gelu(x)
    monkeypatch.delenv("COLXLIP_GELU_IMPL")
    default = layers.gelu(x)
    np.testing.assert_allclose(np.asarray(aspoly), np.asarray(default), atol=1e-5)


def test_gelu_impl_env_selects_stock(monkeypatch):
    """COLXLIP_GELU_IMPL=stock routes to jax.nn.gelu (A/B + HLO-diff knob)."""
    from colxlip_tpu.models import layers

    x = jnp.linspace(-3, 3, 64)
    monkeypatch.setenv("COLXLIP_GELU_IMPL", "stock")
    stock = layers.gelu(x)
    monkeypatch.delenv("COLXLIP_GELU_IMPL")
    fast = layers.gelu(x)
    np.testing.assert_allclose(np.asarray(stock), np.asarray(fast), atol=1e-5)


def test_text_tower_scaled_init(tiny_cfg):
    """Reference TextTransformer.init_parameters (transformer.py:925-940):
    block Dense weights start from depth-scaled normals, not lecun_normal."""
    import dataclasses

    model = ColXLIP(tiny_cfg, dtype=jnp.float32)
    img = jnp.zeros((1, 64, 64, 3))
    txt = _text_batch(np.random.default_rng(0), 1, 32)
    params = model.init(jax.random.PRNGKey(0), img, txt)["params"]
    tcfg = tiny_cfg.text_cfg
    width, layers = tcfg.width, tcfg.layers
    blk = params["text"]["transformer"]["resblocks_0"]
    got_attn = float(jnp.std(blk["attn"]["in_proj"]["kernel"]))
    got_proj = float(jnp.std(blk["mlp"]["c_proj"]["kernel"]))
    got_fc = float(jnp.std(blk["mlp"]["c_fc"]["kernel"]))
    assert abs(got_attn - width ** -0.5) / (width ** -0.5) < 0.12
    want_proj = (width ** -0.5) * ((2 * layers) ** -0.5)
    assert abs(got_proj - want_proj) / want_proj < 0.12
    want_fc = (2 * width) ** -0.5
    assert abs(got_fc - want_fc) / want_fc < 0.12
    # the VISION tower keeps flax defaults (the reference leaves its torch
    # defaults in place): lecun_normal std = in_dim^-0.5 over c_fc
    vblk = params["visual"]["transformer"]["resblocks_0"]
    vw = tiny_cfg.vision_cfg.width
    got_v = float(jnp.std(vblk["mlp"]["c_fc"]["kernel"]))
    assert abs(got_v - vw ** -0.5) / (vw ** -0.5) < 0.12


def test_eot_mask_only_under_argmax_pooling(tiny_cfg):
    """Reference model.py:581-593 guards token zeroing on pool_type ==
    'argmax'; other pool types keep all token features."""
    import dataclasses

    tcfg = dataclasses.replace(tiny_cfg.text_cfg, pool_type="last")
    cfg = dataclasses.replace(tiny_cfg, text_cfg=tcfg)
    model = ColXLIP(cfg, dtype=jnp.float32)
    img = jnp.zeros((1, 64, 64, 3))
    txt = _text_batch(np.random.default_rng(2), 2, 32)
    params = model.init(jax.random.PRNGKey(0), img, txt)
    _, tokens = model.apply(
        params, text=txt,
        method=lambda m, text: m.encode_text(text, normalize=False))
    # position after the EOT would be zeroed pre-head under argmax masking;
    # with pool_type='last' the head sees unmasked features everywhere, so
    # no [B, L] row of the PRE-head input was zeroed: compare against the
    # argmax-pooling model which does mask
    model_argmax = ColXLIP(tiny_cfg, dtype=jnp.float32)
    params_a = model_argmax.init(jax.random.PRNGKey(0), img, txt)
    _, tokens_a = model_argmax.apply(
        params_a, text=txt,
        method=lambda m, text: m.encode_text(text, normalize=False))
    assert not np.allclose(np.asarray(tokens), np.asarray(tokens_a))


def test_gelu_env_typo_fails_loudly(monkeypatch):
    from colxlip_tpu.models.layers import gelu

    monkeypatch.setenv("COLXLIP_GELU_IMPL", "fast13")
    with pytest.raises(ValueError, match="COLXLIP_GELU_IMPL"):
        gelu(jnp.ones((4,)))


def test_sincos_requires_square_grid(tiny_cfg):
    import dataclasses

    vcfg = dataclasses.replace(
        tiny_cfg.vision_cfg, pos_embed_type="sin_cos_2d",
        image_size=(64, 32))
    cfg = dataclasses.replace(tiny_cfg, vision_cfg=vcfg)
    model = ColXLIP(cfg, dtype=jnp.float32)
    with pytest.raises(ValueError, match="square"):
        model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 32, 3)),
                   _text_batch(np.random.default_rng(0), 1, 32))

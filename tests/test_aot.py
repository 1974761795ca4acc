"""AOT export bundles (serving/aot.py — the --torchscript analog).

Pins: save/load round-trip parity with the live jitted model, the symbolic
batch dim (one artifact, several batch sizes), the static-batch and uint8
variants, plain-CLIP (no token heads) output arity, and the loud
platform-mismatch error.
"""
from __future__ import annotations

import json
import os

import numpy as np
import pytest

from colxlip_tpu.factory import create_model, init_params
from colxlip_tpu.serving.aot import (AotModel, load_aot_bundle,
                                     save_aot_bundle)

# eager-vs-AOT-compiled bf16 fusion noise on l2-normalized outputs
TOL = 2e-2


def _live_outputs(model, params, tokens=None, images=None):
    import jax

    if tokens is not None:
        fn = jax.jit(lambda t: model.apply(
            params, text=t,
            method=lambda m, text: m.encode_text(text, normalize=True)))
        out = fn(tokens)
    else:
        fn = jax.jit(lambda i: model.apply(
            params, i,
            method=lambda m, image: m.encode_image(image, normalize=True)))
        out = fn(images)
    out = out if isinstance(out, tuple) else (out,)
    return tuple(np.asarray(o, np.float32) for o in out)


@pytest.fixture(scope="module")
def colxlip_bundle(tmp_path_factory):
    model, cfg = create_model("ViT-S-16-test-colxlip")
    params = init_params(model, cfg)
    out = str(tmp_path_factory.mktemp("aot"))
    meta = save_aot_bundle(out, model, params, cfg,
                           model_name="ViT-S-16-test-colxlip",
                           platforms=("cpu",))
    return model, cfg, params, out, meta


def _tokens(n, ctx):
    t = np.zeros((n, ctx), np.int32)
    t[:, 0] = 49406
    rng = np.random.default_rng(0)
    t[:, 1:5] = rng.integers(1000, 2000, (n, 4))
    t[:, 5] = 49407
    return t


def test_round_trip_parity(colxlip_bundle):
    model, cfg, params, out, meta = colxlip_bundle
    aot = load_aot_bundle(out)
    assert isinstance(aot, AotModel)
    assert meta["outputs"] == ["pooled", "token_features"]

    toks = _tokens(3, cfg.text_cfg.context_length)
    got = aot.encode_text(toks)
    want = _live_outputs(model, params, tokens=toks)
    assert len(got) == len(want) == 2
    for g, w in zip(got, want):
        assert np.asarray(g).shape == w.shape
        np.testing.assert_allclose(np.asarray(g, np.float32), w, atol=TOL)

    s = cfg.vision_cfg.image_size
    imgs = np.random.default_rng(1).standard_normal(
        (2, s, s, 3)).astype(np.float32)
    got = aot.encode_image(imgs)
    want = _live_outputs(model, params, images=imgs)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g, np.float32), w, atol=TOL)


def test_symbolic_batch_serves_any_size(colxlip_bundle):
    _, cfg, _, out, _ = colxlip_bundle
    aot = load_aot_bundle(out)
    for n in (1, 2, 5):
        pooled = np.asarray(aot.encode_text(
            _tokens(n, cfg.text_cfg.context_length))[0])
        assert pooled.shape == (n, cfg.embed_dim)
        # outputs are l2-normalized
        np.testing.assert_allclose(
            np.linalg.norm(pooled, axis=-1), 1.0, atol=1e-2)


def test_input_validation(colxlip_bundle):
    _, cfg, _, out, _ = colxlip_bundle
    aot = load_aot_bundle(out)
    with pytest.raises(ValueError, match="tokens must be"):
        aot.encode_text(np.zeros((2, cfg.text_cfg.context_length + 1),
                                 np.int32))
    with pytest.raises(ValueError, match="images must be"):
        aot.encode_image(np.zeros((2, 8, 8, 3), np.float32))


def test_static_batch_pins_shape(tmp_path):
    model, cfg = create_model("ViT-S-16-test")
    params = init_params(model, cfg)
    out = str(tmp_path / "aot_static")
    meta = save_aot_bundle(out, model, params, cfg, platforms=("cpu",),
                           static_batch=2)
    assert meta["static_batch"] == 2
    aot = load_aot_bundle(out)
    toks = _tokens(2, cfg.text_cfg.context_length)
    assert np.asarray(aot.encode_text(toks)[0]).shape == (2, cfg.embed_dim)
    with pytest.raises(Exception):  # shape mismatch vs the pinned program
        aot.encode_text(_tokens(3, cfg.text_cfg.context_length))


def test_plain_clip_single_output(tmp_path):
    model, cfg = create_model("ViT-S-16-test")
    params = init_params(model, cfg)
    out = str(tmp_path / "aot_clip")
    meta = save_aot_bundle(out, model, params, cfg, platforms=("cpu",))
    assert meta["outputs"] == ["pooled"]
    aot = load_aot_bundle(out)
    got = aot.encode_text(_tokens(2, cfg.text_cfg.context_length))
    assert len(got) == 1


def test_uint8_image_entry(tmp_path):
    """uint8 export normalizes on device; must match the live model fed the
    same uint8 batch (models/configs.py integer-input path)."""
    model, cfg = create_model("ViT-S-16-test-colxlip")
    params = init_params(model, cfg)
    out = str(tmp_path / "aot_u8")
    meta = save_aot_bundle(out, model, params, cfg, platforms=("cpu",),
                           uint8_images=True)
    assert meta["image_dtype"] == "uint8"
    aot = load_aot_bundle(out)
    s = cfg.vision_cfg.image_size
    imgs = np.random.default_rng(2).integers(
        0, 256, (2, s, s, 3)).astype(np.uint8)
    got = aot.encode_image(imgs)
    want = _live_outputs(model, params, images=imgs)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g, np.float32), w, atol=TOL)


def test_platform_mismatch_is_loud(tmp_path):
    model, cfg = create_model("ViT-S-16-test")
    params = init_params(model, cfg)
    out = str(tmp_path / "aot_tpu_only")
    save_aot_bundle(out, model, params, cfg, platforms=("tpu",))
    with pytest.raises(ValueError, match="lowered for"):
        load_aot_bundle(out)


def test_meta_contents(colxlip_bundle):
    _, cfg, params, out, meta = colxlip_bundle
    with open(os.path.join(out, "meta.json")) as f:
        on_disk = json.load(f)
    assert on_disk == meta
    assert on_disk["format"] == "colxlip-aot-v1"
    assert on_disk["embed_dim"] == cfg.embed_dim
    assert on_disk["context_length"] == cfg.text_cfg.context_length
    ls = float(np.exp(np.asarray(params["params"]["logit_scale"])))
    assert on_disk["logit_scale"] == pytest.approx(ls)
    for name, nbytes in on_disk["bytes"].items():
        assert os.path.getsize(os.path.join(out, name + ".jaxexp")) == nbytes

""".pt EXPORT: flax params -> reference-layout torch checkpoint.

Three layers of proof:
  1. algebraic round-trip: export o import == identity on the params tree
  2. strict torch load: the emitted key set/shapes are EXACTLY what a
     reference-layout torch ColXLIP expects (load_state_dict(strict=True))
  3. behavioral parity: the torch oracle running the EXPORTED weights
     matches the flax model that produced them
"""
from __future__ import annotations

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from colxlip_tpu.models import CLIPCfg, ColXLIP
from colxlip_tpu.training.checkpoint import (
    convert_openclip_state_dict,
    export_pt_state_dict,
    load_pt_checkpoint,
    save_pt_checkpoint,
)
from torch_oracle import TorchColXLIP


@pytest.fixture(scope="module")
def flax_model_and_params():
    cfg = CLIPCfg.from_dict({
        "embed_dim": 128,
        "vision_cfg": {"image_size": 64, "layers": 2, "width": 128,
                       "patch_size": 16, "head_width": 32},
        "text_cfg": {"context_length": 32, "vocab_size": 49408, "width": 128,
                     "heads": 4, "layers": 2},
    })
    model = ColXLIP(cfg, dtype=jnp.float32)
    imgs = jnp.zeros((1, 64, 64, 3), jnp.float32)
    txts = jnp.zeros((1, 32), jnp.int32).at[:, 0].set(49406).at[:, 1].set(49407)
    params = model.init(jax.random.PRNGKey(3), imgs, txts)
    return model, cfg, params


def _inputs(rng, b=3, ctx=32):
    imgs = rng.standard_normal((b, 64, 64, 3)).astype(np.float32)
    txts = np.zeros((b, ctx), np.int32)
    for i in range(b):
        txts[i, 0] = 49406
        txts[i, 1:8] = rng.integers(1, 49000, 7)
        txts[i, 8 + i] = 49407
    return imgs, txts


def test_export_import_roundtrip_identity(flax_model_and_params):
    _, _, params = flax_model_and_params
    sd = export_pt_state_dict(params)
    back = convert_openclip_state_dict(sd)

    flat_orig = jax.tree_util.tree_leaves_with_path(params)
    flat_back = jax.tree_util.tree_leaves_with_path(back)
    orig = {jax.tree_util.keystr(k): np.asarray(v) for k, v in flat_orig}
    new = {jax.tree_util.keystr(k): np.asarray(v) for k, v in flat_back}
    assert set(orig) == set(new)
    for k in orig:
        np.testing.assert_array_equal(orig[k], new[k], err_msg=k)


def test_strict_torch_load_and_forward_parity(flax_model_and_params):
    model, cfg, params = flax_model_and_params
    sd = export_pt_state_dict(params)
    tmodel = TorchColXLIP(image_size=64, patch_size=16, vwidth=128, vlayers=2,
                          vheads=4, twidth=128, tlayers=2, theads=4,
                          embed_dim=128, ctx=32)
    # strict load proves the exported key set and shapes exactly match the
    # reference layout — any missing/unexpected key fails here
    tmodel.load_state_dict({k: torch.from_numpy(v) for k, v in sd.items()},
                           strict=True)
    tmodel.eval()

    rng = np.random.default_rng(0)
    imgs, txts = _inputs(rng)
    with torch.no_grad():
        t_img, t_img_tok = tmodel.encode_image(
            torch.from_numpy(imgs).permute(0, 3, 1, 2), normalize=True)
        t_txt, t_txt_tok = tmodel.encode_text(
            torch.from_numpy(txts.astype(np.int64)), normalize=True)
    f_img, f_img_tok = model.apply(
        params, jnp.asarray(imgs),
        method=lambda m, image: m.encode_image(image, normalize=True))
    f_txt, f_txt_tok = model.apply(
        params, text=jnp.asarray(txts),
        method=lambda m, text: m.encode_text(text, normalize=True))
    np.testing.assert_allclose(np.asarray(f_img), t_img.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(f_txt), t_txt.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(f_img_tok), t_img_tok.numpy(),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(f_txt_tok), t_txt_tok.numpy(),
                               atol=2e-4)


def test_save_then_load_pt_checkpoint(flax_model_and_params, tmp_path):
    model, cfg, params = flax_model_and_params
    path = str(tmp_path / "exported.pt")
    save_pt_checkpoint(path, params, epoch=4, name="exp")
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    assert ckpt["epoch"] == 4
    restored = load_pt_checkpoint(path)
    pe = np.asarray(
        restored["params"]["visual"]["positional_embedding"])
    np.testing.assert_array_equal(
        pe, np.asarray(params["params"]["visual"]["positional_embedding"]))


def test_coca_trees_refused():
    with pytest.raises(ValueError, match="CoCa"):
        export_pt_state_dict(
            {"params": {"text_decoder": {}, "visual": {}, "text": {}}})


def test_unmapped_params_fail_loudly(flax_model_and_params):
    _, _, params = flax_model_and_params
    import copy

    bad = copy.deepcopy(jax.tree.map(np.asarray, params))
    bad["params"]["visual"]["mystery_param"] = np.zeros(3)
    with pytest.raises(ValueError, match="no .pt export mapping"):
        export_pt_state_dict(bad)

""".pt checkpoint import: torch-oracle forward must match flax forward.

This is the SURVEY.md §7.1-stage-1 parity oracle: port WEIGHTS (not code)
from a torch OpenCLIP-layout checkpoint and match encode_image/encode_text.
"""
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from colxlip_tpu.models import CLIPCfg, ColXLIP
from colxlip_tpu.training.checkpoint import (
    convert_openclip_state_dict,
    load_pt_checkpoint,
    load_pt_state_dict,
)

from torch_oracle import TorchColXLIP


@pytest.fixture(scope="module")
def oracle_and_flax():
    torch.manual_seed(0)
    tmodel = TorchColXLIP(image_size=64, patch_size=16, vwidth=128, vlayers=2,
                          vheads=4, twidth=128, tlayers=2, theads=4,
                          embed_dim=128, ctx=32)
    tmodel.eval()
    cfg = CLIPCfg.from_dict({
        "embed_dim": 128,
        "vision_cfg": {"image_size": 64, "layers": 2, "width": 128,
                       "patch_size": 16, "head_width": 32},
        "text_cfg": {"context_length": 32, "vocab_size": 49408, "width": 128,
                     "heads": 4, "layers": 2},
    })
    fmodel = ColXLIP(cfg, dtype=jnp.float32)
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params = convert_openclip_state_dict(sd)
    params = jax.tree.map(jnp.asarray, params)
    return tmodel, fmodel, params


def _inputs(rng, b=3, ctx=32):
    imgs = rng.standard_normal((b, 64, 64, 3)).astype(np.float32)
    txts = np.zeros((b, ctx), np.int32)
    for i in range(b):
        txts[i, 0] = 49406
        txts[i, 1:8] = rng.integers(1, 49000, 7)
        txts[i, 8 + i] = 49407
    return imgs, txts


def test_all_params_convert(oracle_and_flax):
    tmodel, fmodel, params = oracle_and_flax
    # every flax param got a value from the torch state dict
    imgs, txts = _inputs(np.random.default_rng(0))
    init_params = fmodel.init(jax.random.PRNGKey(0), jnp.asarray(imgs), jnp.asarray(txts))
    init_paths = {jax.tree_util.keystr(k) for k, _ in
                  jax.tree_util.tree_flatten_with_path(init_params)[0]}
    got_paths = {jax.tree_util.keystr(k) for k, _ in
                 jax.tree_util.tree_flatten_with_path(params)[0]}
    assert init_paths == got_paths


def test_encode_image_parity(oracle_and_flax, rng):
    tmodel, fmodel, params = oracle_and_flax
    imgs, txts = _inputs(rng)
    with torch.no_grad():
        t_pooled, t_tokens = tmodel.encode_image(
            torch.from_numpy(imgs).permute(0, 3, 1, 2), normalize=True
        )
    f_pooled, f_tokens = fmodel.apply(
        params, jnp.asarray(imgs),
        method=lambda m, image: m.encode_image(image, normalize=True),
    )
    np.testing.assert_allclose(
        np.asarray(f_pooled), t_pooled.numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(f_tokens), t_tokens.numpy(), rtol=1e-4, atol=1e-5
    )


def test_encode_text_parity(oracle_and_flax, rng):
    tmodel, fmodel, params = oracle_and_flax
    imgs, txts = _inputs(rng)
    with torch.no_grad():
        t_pooled, t_tokens = tmodel.encode_text(torch.from_numpy(txts).long(), normalize=True)
    f_pooled, f_tokens = fmodel.apply(
        params, text=jnp.asarray(txts),
        method=lambda m, text: m.encode_text(text, normalize=True),
    )
    np.testing.assert_allclose(
        np.asarray(f_pooled), t_pooled.numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(f_tokens), t_tokens.numpy(), rtol=1e-4, atol=1e-5
    )


def test_pt_file_roundtrip_with_module_prefix(oracle_and_flax, tmp_path):
    """Full file path incl. DDP 'module.' prefix stripping + non-strict merge."""
    tmodel, fmodel, params = oracle_and_flax
    sd = {f"module.{k}": v for k, v in tmodel.state_dict().items()}
    path = tmp_path / "ckpt.pt"
    torch.save({"state_dict": sd, "epoch": 7}, path)

    imgs, txts = _inputs(np.random.default_rng(1))
    init_params = fmodel.init(jax.random.PRNGKey(0), jnp.asarray(imgs), jnp.asarray(txts))
    loaded = load_pt_checkpoint(str(path), expected_params=init_params)
    f_pooled, _ = fmodel.apply(
        jax.tree.map(jnp.asarray, loaded), jnp.asarray(imgs),
        method=lambda m, image: m.encode_image(image, normalize=True),
    )
    with torch.no_grad():
        t_pooled, _ = tmodel.encode_image(
            torch.from_numpy(imgs).permute(0, 3, 1, 2), normalize=True
        )
    np.testing.assert_allclose(np.asarray(f_pooled), t_pooled.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_plain_clip_checkpoint_into_colxlip_keeps_token_heads(oracle_and_flax, tmp_path):
    """Importing a base CLIP checkpoint leaves token heads at init
    (reference factory.py:318-341 base-weight reuse with strict=False)."""
    tmodel, fmodel, params = oracle_and_flax
    sd = {k: v for k, v in tmodel.state_dict().items()
          if not k.startswith(("vision_token_layer", "text_token_layer"))}
    path = tmp_path / "base.pt"
    torch.save(sd, path)
    imgs, txts = _inputs(np.random.default_rng(2))
    init_params = fmodel.init(jax.random.PRNGKey(0), jnp.asarray(imgs), jnp.asarray(txts))
    loaded = load_pt_checkpoint(str(path), expected_params=init_params)
    # tower weights replaced, token heads untouched
    got = loaded["params"]["visual"]["proj"]
    np.testing.assert_allclose(got, tmodel.visual.proj.detach().numpy(), rtol=1e-6)
    init_head = init_params["params"]["vision_token_layer"]["proj"]["kernel"]
    np.testing.assert_allclose(
        loaded["params"]["vision_token_layer"]["proj"]["kernel"], np.asarray(init_head)
    )


def test_coca_decoder_import_and_parity():
    """The rebuilt CoCa decoder is op-exact vs the reference's vendored
    MultimodalTransformer (transformer.py:1104-1211): import a torch-oracle
    decoder state dict through convert_openclip_state_dict and match outputs
    (incl. the packed->split cross-attn in_proj surgery)."""
    from torch_oracle import TorchMultimodalDecoder

    from colxlip_tpu.models.coca import MultimodalCfg, MultimodalTransformer, VocabHead

    width, layers, heads, ctx, vocab = 64, 2, 4, 8, 96
    torch.manual_seed(0)
    oracle = TorchMultimodalDecoder(width, layers, heads, ctx, vocab).eval()

    sd = {f"text_decoder.{k}": v.detach().numpy()
          for k, v in oracle.state_dict().items()}
    converted = convert_openclip_state_dict(sd)["params"]

    cfg = MultimodalCfg(context_length=ctx, width=width, heads=heads,
                        layers=layers)
    dec = MultimodalTransformer(cfg, dtype=jnp.float32)
    head = VocabHead(in_features=width, vocab_size=vocab, dtype=jnp.float32)

    rng = np.random.default_rng(0)
    text_embs = rng.standard_normal((2, ctx, width)).astype(np.float32) * 0.2
    image_embs = rng.standard_normal((2, 6, width)).astype(np.float32) * 0.2

    dec_params = {"params": converted["text_decoder"]}
    head_params = {"params": converted["to_logits"]}
    got_hidden = dec.apply(dec_params, jnp.asarray(text_embs),
                           jnp.asarray(image_embs))
    got = head.apply(head_params, got_hidden)
    want = oracle(torch.from_numpy(text_embs),
                  torch.from_numpy(image_embs)).detach().numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=1e-4)


def test_coca_text_tower_import_and_parity():
    """The embed_cls text tower matches the reference semantics exactly —
    incl. build_cls_mask's shifted key mask (transformer.py:966-976), pooling
    'last', ln_final AFTER pooling, and tokens excluding the CLS without
    ln_final — via a weight import from the torch oracle."""
    from torch_oracle import TorchCoCaTextTower

    from colxlip_tpu.models.coca import CoCaTextTower
    from colxlip_tpu.models.configs import CLIPTextCfg

    width, layers, heads, ctx, vocab, dim = 64, 2, 4, 12, 512, 48
    torch.manual_seed(1)
    oracle = TorchCoCaTextTower(width, layers, heads, ctx, vocab, dim).eval()
    sd = {f"text.{k}": v.detach().numpy()
          for k, v in oracle.state_dict().items()}
    converted = convert_openclip_state_dict(sd)["params"]["text"]

    cfg = CLIPTextCfg(context_length=ctx, vocab_size=vocab, width=width,
                      heads=heads, layers=layers)
    tower = CoCaTextTower(cfg, embed_dim=dim, dtype=jnp.float32)

    txt = np.zeros((2, ctx), np.int32)
    txt[0, 0] = 49406 % vocab
    txt[0, 1:5] = 7
    txt[0, 5] = 9
    txt[1, 0] = 3
    txt[1, 1:9] = 5  # different pad pattern
    got_pooled, got_tokens = tower.apply(
        {"params": converted}, jnp.asarray(txt))
    want_pooled, want_tokens = oracle(torch.from_numpy(txt).long())
    np.testing.assert_allclose(np.asarray(got_pooled),
                               want_pooled.detach().numpy(),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_tokens),
                               want_tokens.detach().numpy(),
                               atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("grids", [(14, 21), (14, 7), (7, 14), (24, 10)])
def test_pos_embed_resize_matches_torch_interpolate(grids):
    """resize-on-load parity: the bicubic pos-embed resample matches the
    reference's F.interpolate(mode='bicubic', antialias=True) element-wise
    (model.py:355-378) — the AA path is the PIL a=-0.5 cubic with clamped
    renormalized windows, NOT jax.image.resize's kernel."""
    import torch.nn.functional as F

    from colxlip_tpu.models.pos_embed import interpolate_pos_embed

    oh, nh = grids
    rng = np.random.default_rng(1)
    x = rng.standard_normal((oh, oh, 6)).astype(np.float32)
    want = F.interpolate(
        torch.from_numpy(x).permute(2, 0, 1)[None], size=(nh, nh),
        mode="bicubic", antialias=True)[0].permute(1, 2, 0).numpy()
    pe = np.concatenate(
        [rng.standard_normal((1, 6)).astype(np.float32), x.reshape(-1, 6)])
    got = np.asarray(interpolate_pos_embed(jnp.asarray(pe), (nh, nh), (oh, oh)))
    np.testing.assert_allclose(got[1:].reshape(nh, nh, 6), want, atol=1e-5)
    np.testing.assert_array_equal(got[0], pe[0])  # prefix untouched


def test_vit_l_structure_import_parity(rng):
    """ViT-L-14 structural specifics vs the B-scale fixture: 2-digit resblock
    indices (>=10 layers — regex layer parsing), ASYMMETRIC tower widths
    (ViT-L: vision 1024 vs text 768), patch 14, embed_dim != width. Runs at
    reduced width so the oracle stays CPU-cheap; the mapping is shape-generic
    beyond these structure points (reference factory.py:316-341)."""
    torch.manual_seed(1)
    tmodel = TorchColXLIP(image_size=56, patch_size=14, vwidth=96, vlayers=12,
                          vheads=3, twidth=64, tlayers=12, theads=2,
                          embed_dim=48, ctx=16)
    tmodel.eval()
    cfg = CLIPCfg.from_dict({
        "embed_dim": 48,
        "vision_cfg": {"image_size": 56, "layers": 12, "width": 96,
                       "patch_size": 14, "head_width": 32},
        "text_cfg": {"context_length": 16, "vocab_size": 49408, "width": 64,
                     "heads": 2, "layers": 12},
    })
    fmodel = ColXLIP(cfg, dtype=jnp.float32)
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params = jax.tree.map(jnp.asarray, convert_openclip_state_dict(sd))

    imgs = rng.standard_normal((2, 56, 56, 3)).astype(np.float32)
    txts = np.zeros((2, 16), np.int32)
    txts[:, 0] = 49406
    txts[0, 1:5] = rng.integers(1, 49000, 4)
    txts[0, 5] = 49407
    txts[1, 1:9] = rng.integers(1, 49000, 8)
    txts[1, 9] = 49407

    with torch.no_grad():
        ti_pooled, ti_tokens = tmodel.encode_image(
            torch.from_numpy(imgs).permute(0, 3, 1, 2), normalize=True)
        tt_pooled, tt_tokens = tmodel.encode_text(
            torch.from_numpy(txts).long(), normalize=True)
    fi_pooled, fi_tokens = fmodel.apply(
        params, jnp.asarray(imgs),
        method=lambda m, image: m.encode_image(image, normalize=True))
    ft_pooled, ft_tokens = fmodel.apply(
        params, text=jnp.asarray(txts),
        method=lambda m, text: m.encode_text(text, normalize=True))
    np.testing.assert_allclose(np.asarray(fi_pooled), ti_pooled.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(fi_tokens), ti_tokens.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ft_pooled), tt_pooled.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ft_tokens), tt_tokens.numpy(),
                               rtol=1e-4, atol=1e-5)

"""Cross-framework training-math parity: torch autograd vs jax on the SAME
weights and batch.

The deepest parity check available offline: the torch oracle (reference
architecture + ColCLIP loss semantics, written fresh from the documented
behavior) and this framework must produce the same loss AND the same
parameter gradients for one training step. This validates the entire
differentiable path — towers, token heads, EOT masking, normalization, the
masked-mean MaxSim loss — not just forward activations.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from colxlip_tpu.losses import colclip_loss
from colxlip_tpu.models import CLIPCfg, ColXLIP
from colxlip_tpu.training.checkpoint import convert_openclip_state_dict

from torch_oracle import TorchColXLIP


def torch_colclip_loss(model, images, texts, alpha=0.6):
    """Reference ColClipLoss single-process semantics (loss.py:258-294)."""
    image_features, token_image = model.encode_image(images, normalize=True)
    text_features, token_text = model.encode_text(texts, normalize=True)
    scale = model.logit_scale.exp()
    lpi = scale * image_features @ text_features.T
    lpt = lpi.T
    sim = torch.einsum("mnd,kqd->mknq", token_text, token_image)
    max_sim = sim.max(dim=3)[0]
    mask = (max_sim != 0).float()
    s = max_sim.sum(dim=2) / (mask.sum(dim=2) + 1e-8)
    lptt = scale * s
    lpit = lptt.T
    labels = torch.arange(len(images))
    g = (F.cross_entropy(lpi, labels) + F.cross_entropy(lpt, labels)) / 2
    t = (F.cross_entropy(lpit, labels) + F.cross_entropy(lptt, labels)) / 2
    return alpha * g + (1 - alpha) * t


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(1)
    tmodel = TorchColXLIP(image_size=64, patch_size=16, vwidth=128, vlayers=2,
                          vheads=4, twidth=128, tlayers=2, theads=4,
                          embed_dim=128, ctx=32)
    tmodel.train()
    cfg = CLIPCfg.from_dict({
        "embed_dim": 128,
        "vision_cfg": {"image_size": 64, "layers": 2, "width": 128,
                       "patch_size": 16, "head_width": 32},
        "text_cfg": {"context_length": 32, "vocab_size": 49408, "width": 128,
                     "heads": 4, "layers": 2},
    })
    fmodel = ColXLIP(cfg, dtype=jnp.float32)
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params = jax.tree.map(jnp.asarray, convert_openclip_state_dict(sd))

    rng = np.random.default_rng(0)
    b = 6
    imgs = rng.standard_normal((b, 64, 64, 3)).astype(np.float32)
    txts = np.zeros((b, 32), np.int32)
    for i in range(b):
        txts[i, 0] = 49406
        txts[i, 1:7] = rng.integers(1, 49000, 6)
        txts[i, 7 + i] = 49407
    return tmodel, fmodel, params, imgs, txts


def test_loss_value_parity(pair):
    tmodel, fmodel, params, imgs, txts = pair
    t_loss = torch_colclip_loss(
        tmodel, torch.from_numpy(imgs).permute(0, 3, 1, 2),
        torch.from_numpy(txts).long(),
    )
    out = fmodel.apply(params, jnp.asarray(imgs), jnp.asarray(txts))
    j = colclip_loss(
        out["image_features"], out["text_features"],
        out["token_image_features"], out["token_text_features"],
        out["logit_scale"], alpha=0.6, maxsim_impl="xla",
    )
    np.testing.assert_allclose(float(j["total_loss"]), float(t_loss), rtol=1e-4)


@pytest.mark.slow
def test_gradient_parity(pair):
    """Parameter gradients agree across frameworks to 1e-3 relative."""
    tmodel, fmodel, params, imgs, txts = pair

    # torch side
    tmodel.zero_grad()
    t_loss = torch_colclip_loss(
        tmodel, torch.from_numpy(imgs).permute(0, 3, 1, 2),
        torch.from_numpy(txts).long(),
    )
    t_loss.backward()

    # jax side
    def loss_fn(p):
        out = fmodel.apply(p, jnp.asarray(imgs), jnp.asarray(txts))
        return colclip_loss(
            out["image_features"], out["text_features"],
            out["token_image_features"], out["token_text_features"],
            out["logit_scale"], alpha=0.6, maxsim_impl="xla",
        )["total_loss"]

    grads = jax.grad(loss_fn)(params)["params"]

    checks = [
        # (torch param, jax grad path, transform)
        (tmodel.logit_scale, grads["logit_scale"], lambda x: x),
        (tmodel.visual.proj, grads["visual"]["proj"], lambda x: x),
        (tmodel.text_projection, grads["text"]["text_projection"], lambda x: x),
        (tmodel.visual.class_embedding, grads["visual"]["class_embedding"], lambda x: x),
        (tmodel.vision_token_layer[1].weight,
         grads["vision_token_layer"]["proj"]["kernel"], lambda x: x.T),
        (tmodel.text_token_layer[1].weight,
         grads["text_token_layer"]["proj"]["kernel"], lambda x: x.T),
        (tmodel.visual.transformer.resblocks[0].mlp.c_fc.weight,
         grads["visual"]["transformer"]["resblocks_0"]["mlp"]["c_fc"]["kernel"],
         lambda x: x.T),
        (tmodel.transformer.resblocks[1].attn.in_proj_weight,
         grads["text"]["transformer"]["resblocks_1"]["attn"]["in_proj"]["kernel"],
         lambda x: x.T),
        (tmodel.token_embedding.weight,
         grads["text"]["token_embedding"]["embedding"], lambda x: x),
    ]
    for tparam, jgrad, tf in checks:
        tg = tparam.grad.detach().numpy()
        jg = tf(np.asarray(jgrad))
        denom = np.abs(tg).max() + 1e-12
        rel = np.abs(jg - tg).max() / denom
        assert rel < 1e-3, (tparam.shape, rel)

"""Factory surface tests: model dispatch, precision, loss selection, tokenizer."""
import argparse

import jax.numpy as jnp
import pytest

from colxlip_tpu.factory import (
    create_loss,
    create_model,
    create_model_and_transforms,
    get_tokenizer,
)
from colxlip_tpu.models import CLIP, ColXLIP
from colxlip_tpu.pretrained import get_pretrained_url, list_pretrained


def _args(**kw):
    ns = argparse.Namespace(
        model="ViT-B-32-colxlip", siglip=False, alpha=0.5, local_loss=False,
        gather_with_grad=False, accum_freq=1, maxsim_impl="auto",
        ce_impl="dense", token_dist="gather", dist_impl=None,
        distill_model=None, distill_pretrained=None,
    )
    for k, v in kw.items():
        setattr(ns, k, v)
    return ns


def test_model_name_dispatch():
    m1, _ = create_model("ViT-S-16-test")
    assert isinstance(m1, CLIP)
    m2, _ = create_model("ViT-B-32-colxlip")
    assert isinstance(m2, ColXLIP)


def test_precision_policies():
    m, _ = create_model("ViT-S-16-test", precision="fp32")
    assert m.dtype == jnp.float32 and m.param_dtype == jnp.float32
    m, _ = create_model("ViT-S-16-test", precision="bf16")
    assert m.dtype == jnp.bfloat16 and m.param_dtype == jnp.float32
    m, _ = create_model("ViT-S-16-test", precision="pure_bf16")
    assert m.dtype == jnp.bfloat16 and m.param_dtype == jnp.bfloat16


def test_unknown_model_raises():
    with pytest.raises(RuntimeError, match="not found"):
        create_model("No-Such-Model")


def test_create_loss_dispatch():
    assert create_loss(_args()).loss_type == "colclip"
    assert create_loss(_args(model="ViT-B-32")).loss_type == "clip"
    assert create_loss(_args(siglip=True)).loss_type == "siglip"
    assert create_loss(_args(
        distill_model="ViT-B-32", distill_pretrained="x.pt"
    )).loss_type == "distill"
    cfg = create_loss(_args(alpha=0.7, accum_freq=4, local_loss=True,
                            token_dist="ring"))
    assert cfg.alpha == 0.7 and cfg.accum_freq == 4
    assert cfg.local_loss and cfg.token_dist == "ring"


def test_create_model_and_transforms_shapes():
    model, cfg, params, pp_train, pp_val = create_model_and_transforms(
        "ViT-S-16-test", precision="fp32"
    )
    from PIL import Image
    import numpy as np

    img = Image.new("RGB", (100, 80), (128, 64, 32))
    assert pp_train(img).shape == (64, 64, 3)
    assert pp_val(img).shape == (64, 64, 3)
    n = sum(int(np.prod(x.shape)) for x in
            __import__("jax").tree.leaves(params))
    assert n > 1e6


def test_get_tokenizer_context_from_config():
    tok = get_tokenizer("ViT-S-16-test")
    assert tok.context_length == 32
    tok = get_tokenizer("ViT-B-16")
    assert tok.context_length == 77


def test_pretrained_registry():
    assert len(list_pretrained()) >= 8
    assert get_pretrained_url("ViT-B-32-colxlip", "laion400m_e32").startswith("https://")
    assert get_pretrained_url("ViT-B-16", "openai") is not None
    assert get_pretrained_url("ViT-B-16", "bogus") is None


def test_orbax_load_nonstrict_and_resize(tmp_path):
    """The orbax branch of load_weights mirrors the .pt branch: a plain-CLIP
    checkpoint loads into a colxlip model keeping token heads at init, and a
    224-trained pos embed interpolates to a forced image size."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from colxlip_tpu.factory import create_model, init_params, load_weights
    from colxlip_tpu.training.checkpoint import save_checkpoint
    from colxlip_tpu.parallel.train_step import TrainState

    from colxlip_tpu.models import ColXLIP

    _, cfg = create_model("ViT-S-16-test")
    model = ColXLIP(cfg, dtype=jnp.float32)  # token heads present
    params = init_params(model, cfg, seed=0)
    state = TrainState(jnp.zeros((), jnp.int32), params, ())
    path = save_checkpoint(str(tmp_path / "ck"), state, epoch=1, name="t")

    # strip the token heads to fake a plain-CLIP checkpoint
    import orbax.checkpoint as ocp
    from colxlip_tpu.training.checkpoint import load_native_checkpoint

    restored = load_native_checkpoint(path)
    p = restored["state"]["params"]["params"]
    p.pop("vision_token_layer", None)
    p.pop("text_token_layer", None)
    stripped = str(tmp_path / "stripped")
    ocp.PyTreeCheckpointer().save(stripped, restored)

    loaded = load_weights(model, cfg, stripped, seed=1)
    # towers come from the checkpoint...
    got = loaded["params"]["visual"]["transformer"]["resblocks_0"]["mlp"]["c_fc"]["kernel"]
    want = params["params"]["visual"]["transformer"]["resblocks_0"]["mlp"]["c_fc"]["kernel"]
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # ...token heads stay at the (seed=1) init, not absent
    assert "vision_token_layer" in loaded["params"]


def test_save_most_recent_survives_stale_old_dir(tmp_path):
    """A crash between the two renames leaves epoch_latest.old; the next
    save must clear it instead of raising ENOTEMPTY forever after."""
    import jax.numpy as jnp
    import os

    from colxlip_tpu.parallel.train_step import TrainState
    from colxlip_tpu.training.checkpoint import save_checkpoint

    state = TrainState(jnp.zeros((), jnp.int32),
                       {"params": {"w": jnp.ones((2,))}}, ())
    ckdir = str(tmp_path / "ck")
    save_checkpoint(ckdir, state, epoch=1, name="t", most_recent=True)
    # simulate the crash leftover
    stale = os.path.join(ckdir, "epoch_latest.old")
    os.makedirs(os.path.join(stale, "junk"))
    with open(os.path.join(stale, "junk", "f"), "w") as f:
        f.write("x")
    save_checkpoint(ckdir, state, epoch=2, name="t", most_recent=True)
    assert not os.path.exists(stale)

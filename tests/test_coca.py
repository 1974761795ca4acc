"""CoCa model family tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from colxlip_tpu.losses import coca_loss
from colxlip_tpu.models import CLIPCfg, get_model_config
from colxlip_tpu.models.coca import CoCa, CoCaTextTower, MultimodalCfg
from colxlip_tpu.models.layers import AttentionalPooler

CTX = 32


@pytest.fixture(scope="module")
def coca_setup():
    cfg = CLIPCfg.from_dict(get_model_config("ViT-S-16-test"))
    model = CoCa(
        cfg,
        MultimodalCfg(context_length=CTX - 1, width=128, heads=4, layers=2),
        dtype=jnp.float32,
    )
    img = jnp.ones((2, 64, 64, 3)) * 0.1
    txt = (
        jnp.zeros((2, CTX), jnp.int32)
        .at[:, 0].set(49406).at[:, 1:5].set(777).at[:, 5].set(49407)
    )
    params = model.init(jax.random.PRNGKey(0), img, txt)
    return model, params, img, txt, cfg


def test_coca_forward_shapes(coca_setup):
    model, params, img, txt, cfg = coca_setup
    out = model.apply(params, img, txt)
    assert out["image_features"].shape == (2, cfg.embed_dim)
    assert out["text_features"].shape == (2, cfg.embed_dim)
    assert out["logits"].shape == (2, CTX - 1, cfg.text_cfg.vocab_size)
    assert out["labels"].shape == (2, CTX - 1)


def test_coca_loss_finite_and_decreases(coca_setup):
    import optax

    model, params, img, txt, cfg = coca_setup
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            out = model.apply(p, img, txt)
            d = coca_loss(
                out["image_features"], out["text_features"], out["logits"],
                out["labels"], out["logit_scale"], output_dict=True,
            )
            return d["contrastive_loss"] + d["caption_loss"], d
        (loss, d), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(5):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_caption_logits_are_causal(coca_setup):
    """Changing a LATER text token must not change earlier caption logits."""
    model, params, img, txt, _ = coca_setup
    out1 = model.apply(params, img, txt)
    txt2 = np.asarray(txt).copy()
    txt2[:, 4] = 1234  # position 4; logits at positions < 3 must not move
    out2 = model.apply(params, img, jnp.asarray(txt2))
    np.testing.assert_allclose(
        np.asarray(out1["logits"][:, :3]), np.asarray(out2["logits"][:, :3]),
        rtol=1e-4, atol=1e-5,
    )
    assert not np.allclose(
        np.asarray(out1["logits"][:, 4]), np.asarray(out2["logits"][:, 4]), atol=1e-3
    )


def test_attentional_pooler_shapes():
    pool = AttentionalPooler(d_model=64, n_head=4, n_queries=16, dtype=jnp.float32)
    x = jnp.ones((3, 25, 96))  # kv width differs from d_model
    params = pool.init(jax.random.PRNGKey(0), x)
    out = pool.apply(params, x)
    assert out.shape == (3, 16, 64)


def test_coca_text_tower_pad_mask():
    """Pad tokens after EOT must not influence the pooled CLS feature."""
    from colxlip_tpu.models.configs import CLIPTextCfg

    cfg = CLIPTextCfg(context_length=CTX, width=64, heads=4, layers=2)
    tower = CoCaTextTower(cfg, embed_dim=64, dtype=jnp.float32)
    txt = (
        np.zeros((1, CTX), np.int32)
    )
    txt[0, 0] = 49406
    txt[0, 1:4] = 555
    txt[0, 4] = 49407
    params = tower.init(jax.random.PRNGKey(0), jnp.asarray(txt))
    p1, _ = tower.apply(params, jnp.asarray(txt))
    txt2 = txt.copy()
    txt2[0, 10] = 0  # already pad — no-op sanity
    p2, _ = tower.apply(params, jnp.asarray(txt2))
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), rtol=1e-5)


def test_coca_with_train_step(coca_setup):
    """CoCa trains through the standard make_train_step machinery."""
    import optax
    from colxlip_tpu.parallel.train_step import (
        TrainStepConfig, init_train_state, make_train_step,
    )
    from colxlip_tpu.training.optim import create_optimizer

    model, params, img, txt, cfg = coca_setup
    tx = create_optimizer(1e-3, weight_decay=0.1)
    state = init_train_state(model, tx, jax.random.PRNGKey(0), img, txt)
    step = make_train_step(model, tx, TrainStepConfig(loss_type="coca"), donate=False)
    losses = []
    for _ in range(3):
        state, m = step(state, img, txt)
        losses.append(float(m["total_loss"]))
        assert np.isfinite(float(m["caption_loss"]))
    assert losses[-1] < losses[0]


def test_decoder_structure_matches_reference(coca_setup):
    """Reference transformer.py:1104-1211: per decoder layer one causal
    self-attn block AND one cross-attn block, EACH with its own MLP; the
    cross block LayerNorms the image k/v (ln_1_kv), not the query."""
    model, params, *_ = coca_setup
    dec = params["params"]["text_decoder"]
    assert "resblocks_0" in dec and "cross_attn_0" in dec
    # two MLPs per layer
    assert "mlp" in dec["resblocks_0"] and "mlp" in dec["cross_attn_0"]
    # cross block: separate q/k/v projections (cross-attention), ln_1_kv
    assert "ln_1_kv" in dec["cross_attn_0"]
    assert "q_proj" in dec["cross_attn_0"]["attn"]
    # self block: packed in_proj (self-attention)
    assert "in_proj" in dec["resblocks_0"]["attn"]
    # depth-scaled init on both stacks (reference init_parameters)
    import numpy as _np

    width = dec["resblocks_0"]["attn"]["in_proj"]["kernel"].shape[0]
    got = float(_np.std(dec["resblocks_0"]["attn"]["in_proj"]["kernel"]))
    assert abs(got - width ** -0.5) / (width ** -0.5) < 0.15


def test_cls_mask_matches_reference_rows(coca_setup):
    """build_cls_mask (transformer.py:966-976): text-token query rows attend
    pads purely causally; only the appended CLS row hides pad keys."""
    model, params, img, txt, cfg = coca_setup
    # flipping a pad token's EMBEDDING would change token rows if pads were
    # masked for them; instead check the observable: token features at
    # positions before any pad must depend on pad-key attendability only via
    # the CLS row. Cheap observable: changing a pad token id (0 -> another
    # pad-equivalent id) changes token features (they ATTEND pads causally)
    # but with our fixed vocab ids we instead assert pooled invariance
    # (CLS hides pads) while token features are NOT invariant to zeroing a
    # non-pad token.
    pooled1, tokens1 = model.apply(
        params, txt, method=lambda m, t: m.encode_text(t, normalize=False))
    txt2 = txt.at[:, 10].set(0)  # already pad: exact no-op
    pooled2, tokens2 = model.apply(
        params, txt2, method=lambda m, t: m.encode_text(t, normalize=False))
    np.testing.assert_allclose(np.asarray(pooled1), np.asarray(pooled2),
                               rtol=1e-6)
    # a real content change must flow into token features (rows attend
    # causally, not pad-masked): change a non-pad token
    txt3 = txt.at[:, 2].set(888)
    _, tokens3 = model.apply(
        params, txt3, method=lambda m, t: m.encode_text(t, normalize=False))
    assert not np.allclose(np.asarray(tokens1[:, 3:5]),
                           np.asarray(tokens3[:, 3:5]))


def test_coca_grad_checkpointing_matches(coca_setup):
    """remat=True (the reference's set_grad_checkpointing on text tower and
    multimodal decoder) must not change values or gradients."""
    model, params, img, txt, cfg = coca_setup
    from colxlip_tpu.models.coca import CoCa, MultimodalCfg

    model_r = CoCa(cfg, MultimodalCfg(context_length=CTX - 1, width=128,
                                      heads=4, layers=2),
                   dtype=jnp.float32, remat=True)

    def loss_fn(m):
        def f(p):
            out = m.apply(p, img, txt)
            return (jnp.mean(out["logits"].astype(jnp.float32) ** 2)
                    + jnp.mean(out["text_features"] ** 2))
        return f

    v1, g1 = jax.value_and_grad(loss_fn(model))(params)
    v2, g2 = jax.value_and_grad(loss_fn(model_r))(params)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_generate_captions(coca_setup):
    """Greedy decode: deterministic, SOT first, pads after the first EOT,
    and step-1 equals the argmax of caption_logits computed directly."""
    from colxlip_tpu.serving.generate import EOT, SOT, generate_captions

    model, params, img, txt, cfg = coca_setup
    toks = generate_captions(model, params, img, max_len=8)
    assert toks.shape == (2, CTX)
    assert (toks[:, 0] == SOT).all()
    toks2 = generate_captions(model, params, img, max_len=8)
    np.testing.assert_array_equal(toks, toks2)  # greedy is deterministic
    # everything after the first EOT is pad
    for row in toks:
        hits = np.where(row == EOT)[0]
        if hits.size:
            assert (row[hits[0] + 1:] == 0).all()
    assert (toks[:, 8:] == 0).all()  # max_len cutoff

    # one-step consistency with the raw logits
    buf = np.zeros((2, CTX), np.int32)
    buf[:, 0] = SOT
    logits = model.apply(params, jnp.asarray(buf), model.apply(
        params, img, method=type(model).embed_images),
        method=type(model).caption_logits)
    want_first = np.argmax(np.asarray(logits[:, 0], np.float32), axis=-1)
    np.testing.assert_array_equal(toks[:, 1], want_first)

    # top-k sampling runs and differs across seeds (statistically)
    s1 = generate_captions(model, params, img, max_len=8, method="top_k",
                           top_k=20, temperature=2.0,
                           rng=jax.random.PRNGKey(1))
    s2 = generate_captions(model, params, img, max_len=8, method="top_k",
                           top_k=20, temperature=2.0,
                           rng=jax.random.PRNGKey(2))
    assert s1.shape == toks.shape
    assert not np.array_equal(s1, s2)


def test_tokens_to_text_roundtrip():
    from colxlip_tpu.data.tokenizer import SimpleTokenizer
    from colxlip_tpu.serving.generate import tokens_to_text

    tok = SimpleTokenizer(context_length=16)
    ids = tok(["a dog on grass"])
    [text] = tokens_to_text(ids, tok)
    assert "dog" in text


def test_generate_top_p(coca_setup):
    from colxlip_tpu.serving.generate import generate_captions

    model, params, img, *_ = coca_setup
    t1 = generate_captions(model, params, img, max_len=6, method="top_p",
                           top_p=0.95, temperature=2.0,
                           rng=jax.random.PRNGKey(3))
    assert t1.shape[0] == 2
    # p -> 0 collapses the nucleus to the argmax == greedy
    t_small = generate_captions(model, params, img, max_len=6,
                                method="top_p", top_p=1e-6,
                                rng=jax.random.PRNGKey(3))
    greedy = generate_captions(model, params, img, max_len=6)
    np.testing.assert_array_equal(t_small, greedy)

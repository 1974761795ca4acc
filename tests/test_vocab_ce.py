"""Streaming caption CE (ops/vocab_ce.py) vs the dense path.

The dense reference is losses/coca.caption_cross_entropy over materialized
[B, L, V] logits (reference CoCaLoss semantics, loss.py:298-340); the
streaming path must match its value and the AD gradients through both the
hidden states and the head kernel.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from colxlip_tpu.losses.coca import caption_cross_entropy, coca_loss
from colxlip_tpu.ops.vocab_ce import streaming_vocab_ce


@pytest.fixture
def case():
    rng = np.random.default_rng(0)
    b, l, d, v = 4, 13, 32, 257   # l*b NOT a multiple of the chunk -> pads
    hidden = jnp.asarray(rng.standard_normal((b, l, d)), jnp.float32) * 0.3
    kernel = jnp.asarray(rng.standard_normal((d, v)), jnp.float32) * 0.1
    labels = jnp.asarray(rng.integers(0, v, (b, l)), jnp.int32)
    labels = labels.at[:, -3:].set(0)  # pad tail (ignore_index=0)
    return hidden, kernel, labels


def _dense(hidden, kernel, labels):
    return caption_cross_entropy(hidden @ kernel, labels, ignore_index=0)


def test_value_matches_dense(case):
    hidden, kernel, labels = case
    got = streaming_vocab_ce(hidden, kernel, labels, 0, 16)
    want = _dense(hidden, kernel, labels)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-6)


def test_value_single_chunk_and_ragged(case):
    hidden, kernel, labels = case
    want = float(_dense(hidden, kernel, labels))
    for chunk in (4, 52, 1024):  # divisor, full rows, larger-than-rows
        got = float(streaming_vocab_ce(hidden, kernel, labels, 0, chunk))
        np.testing.assert_allclose(got, want, rtol=1e-6)


def test_grads_match_dense_ad(case):
    hidden, kernel, labels = case

    g_stream = jax.grad(
        lambda h, k: streaming_vocab_ce(h, k, labels, 0, 16), argnums=(0, 1)
    )(hidden, kernel)
    g_dense = jax.grad(
        lambda h, k: _dense(h, k, labels), argnums=(0, 1)
    )(hidden, kernel)
    np.testing.assert_allclose(
        np.asarray(g_stream[0]), np.asarray(g_dense[0]), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(g_stream[1]), np.asarray(g_dense[1]), atol=1e-6)


def test_all_padding_rows_no_nan():
    hidden = jnp.ones((2, 3, 8), jnp.float32)
    kernel = jnp.ones((8, 11), jnp.float32)
    labels = jnp.zeros((2, 3), jnp.int32)  # everything ignored
    val = streaming_vocab_ce(hidden, kernel, labels, 0, 4)
    assert float(val) == 0.0
    g = jax.grad(lambda h: streaming_vocab_ce(h, kernel, labels, 0, 4))(hidden)
    assert bool(jnp.all(jnp.isfinite(g)))


def test_bf16_hidden_close(case):
    hidden, kernel, labels = case
    got = streaming_vocab_ce(
        hidden.astype(jnp.bfloat16), kernel.astype(jnp.bfloat16), labels, 0, 16)
    want = _dense(hidden, kernel, labels)
    np.testing.assert_allclose(float(got), float(want), rtol=2e-2)
    g = jax.grad(lambda h: streaming_vocab_ce(
        h, kernel.astype(jnp.bfloat16), labels, 0, 16))(
        hidden.astype(jnp.bfloat16))
    assert g.dtype == jnp.bfloat16


def test_coca_loss_fused_matches_dense(case):
    """coca_loss(ce_impl='fused') with hidden+kernel == the dense coca_loss."""
    hidden, kernel, labels = case
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.standard_normal((4, 16)), jnp.float32)
    txt = jnp.asarray(rng.standard_normal((4, 16)), jnp.float32)
    scale = jnp.asarray(50.0, jnp.float32)
    common = dict(caption_loss_weight=2.0, clip_loss_weight=1.0,
                  output_dict=True)
    dense = coca_loss(img, txt, hidden @ kernel, labels, scale, **common)
    fused = coca_loss(img, txt, None, labels, scale, ce_impl="fused",
                      caption_hidden=hidden, caption_head_kernel=kernel,
                      **common)
    np.testing.assert_allclose(
        float(fused["caption_loss"]), float(dense["caption_loss"]), rtol=1e-6)
    np.testing.assert_allclose(
        float(fused["contrastive_loss"]), float(dense["contrastive_loss"]),
        rtol=1e-6)


def test_coca_model_emits_streaming_inputs():
    """CoCa forward exposes caption_hidden + head kernel consistent with its
    dense logits (logits == hidden @ kernel)."""
    from colxlip_tpu.factory import create_model, init_params

    model, cfg = create_model("coca-S-test")
    params = init_params(model, cfg, seed=0)
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
    txt = np.zeros((2, cfg.text_cfg.context_length), np.int32)
    txt[:, 0] = 49406
    txt[:, 1:5] = rng.integers(1, 49000, (2, 4))
    txt[:, 5] = 49407
    out = model.apply(params, img, jnp.asarray(txt))
    recon = out["caption_hidden"] @ out["caption_head_kernel"].astype(
        out["caption_hidden"].dtype)
    np.testing.assert_allclose(
        np.asarray(recon, np.float32), np.asarray(out["logits"], np.float32),
        atol=1e-2)


def test_fp32_kernel_bf16_hidden_fwd_bwd_consistent(case):
    """With a fp32-stored kernel and bf16 activations the forward must run
    the matmul on the bf16-cast kernel (the MXU path) — i.e. value and grads
    are EXACTLY those of the pre-cast kernel, so the custom-VJP backward
    (which recomputes softmax from the same cast) differentiates the loss
    the forward actually reported."""
    hidden, kernel, labels = case
    h16 = hidden.astype(jnp.bfloat16)
    k32 = kernel  # fp32 storage, as in the train state
    k_pre = kernel.astype(jnp.bfloat16).astype(jnp.float32)
    got = streaming_vocab_ce(h16, k32, labels, 0, 16)
    want = streaming_vocab_ce(h16, k_pre, labels, 0, 16)
    assert float(got) == float(want)
    g32 = jax.grad(lambda h: streaming_vocab_ce(h, k32, labels, 0, 16))(h16)
    gpre = jax.grad(lambda h: streaming_vocab_ce(h, k_pre, labels, 0, 16))(h16)
    np.testing.assert_array_equal(np.asarray(g32, np.float32),
                                  np.asarray(gpre, np.float32))

"""MaxSim op: every implementation must match the numpy oracle exactly."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from colxlip_tpu.ops.maxsim import maxsim_chunked, maxsim_xla

from oracles import np_colbert_similarity, np_l2norm


def _features(rng, m=6, k=5, lt=7, li=9, d=16, normalize=True, with_zeros=True):
    t = rng.standard_normal((m, lt, d)).astype(np.float32)
    i = rng.standard_normal((k, li, d)).astype(np.float32)
    if with_zeros:
        # emulate ColXLIP's zeroed-at/after-EOT text rows (pre-projection case)
        t[0, 4:] = 0.0
        t[2, 2:] = 0.0
    if normalize:
        # note: zero rows stay zero under safe-normalize, matching F.normalize
        t = np_l2norm(t)
        i = np_l2norm(i)
    return t, i


@pytest.mark.parametrize("mask_mode", ["nonzero", "plain"])
def test_maxsim_xla_matches_oracle(rng, mask_mode):
    t, i = _features(rng)
    got = np.asarray(maxsim_xla(jnp.asarray(t), jnp.asarray(i), mask_mode=mask_mode))
    want = np_colbert_similarity(t, i, mask_mode=mask_mode)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_maxsim_valid_mask(rng):
    t, i = _features(rng, with_zeros=False)
    mask = (rng.random((t.shape[0], t.shape[1])) > 0.3).astype(np.float32)
    mask[:, 0] = 1.0
    got = np.asarray(
        maxsim_xla(jnp.asarray(t), jnp.asarray(i), mask_mode="valid", text_mask=jnp.asarray(mask))
    )
    want = np_colbert_similarity(t, i, mask_mode="valid", text_mask=mask)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("m,k", [(6, 5), (16, 128), (33, 130)])
def test_maxsim_chunked_matches_xla(rng, m, k):
    t, i = _features(rng, m=m, k=k)
    tj, ij = jnp.asarray(t), jnp.asarray(i)
    got = np.asarray(maxsim_chunked(tj, ij, m_chunk=8, k_chunk=32))
    want = np.asarray(maxsim_xla(tj, ij))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_maxsim_chunked_gradients_match_xla(rng):
    t, i = _features(rng, m=10, k=12, with_zeros=False)
    tj, ij = jnp.asarray(t), jnp.asarray(i)

    def loss_xla(t_, i_):
        return jnp.sum(jnp.sin(maxsim_xla(t_, i_)))

    def loss_chunked(t_, i_):
        return jnp.sum(jnp.sin(maxsim_chunked(t_, i_, m_chunk=4, k_chunk=8)))

    g1t, g1i = jax.grad(loss_xla, argnums=(0, 1))(tj, ij)
    g2t, g2i = jax.grad(loss_chunked, argnums=(0, 1))(tj, ij)
    np.testing.assert_allclose(np.asarray(g1t), np.asarray(g2t), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g1i), np.asarray(g2i), rtol=1e-4, atol=1e-6)


def test_maxsim_values_in_unit_range(rng):
    t, i = _features(rng, with_zeros=False)
    s = np.asarray(maxsim_xla(jnp.asarray(t), jnp.asarray(i)))
    assert np.all(s <= 1.0 + 1e-5) and np.all(s >= -1.0 - 1e-5)


# ---------------------------------------------------------------------------
# streaming impl (q-chunked fwd + argmax-residual custom VJP) — round 2
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("mask_mode", ["nonzero", "plain"])
@pytest.mark.parametrize("m,k,li", [(6, 5, 9), (16, 128, 28), (33, 130, 196)])
def test_maxsim_streaming_matches_xla(rng, mask_mode, m, k, li):
    from colxlip_tpu.ops.maxsim import maxsim_streaming

    t, i = _features(rng, m=m, k=k, li=li)
    tj, ij = jnp.asarray(t), jnp.asarray(i)
    got = np.asarray(maxsim_streaming(tj, ij, mask_mode=mask_mode))
    want = np.asarray(maxsim_xla(tj, ij, mask_mode=mask_mode))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_maxsim_streaming_valid_mask(rng):
    from colxlip_tpu.ops.maxsim import maxsim_streaming

    t, i = _features(rng, with_zeros=False)
    mask = (rng.random((t.shape[0], t.shape[1])) > 0.3).astype(np.float32)
    mask[:, 0] = 1.0
    got = np.asarray(maxsim_streaming(
        jnp.asarray(t), jnp.asarray(i), mask_mode="valid",
        text_mask=jnp.asarray(mask)))
    want = np_colbert_similarity(t, i, mask_mode="valid", text_mask=mask)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("mask_mode", ["nonzero", "plain"])
def test_maxsim_streaming_gradients_match_xla(rng, mask_mode):
    """Custom VJP routes dS through the argmax one-hot; with no ties this
    equals AD's reduce_max gradient exactly."""
    from colxlip_tpu.ops.maxsim import maxsim_streaming

    t, i = _features(rng, m=10, k=12, li=28, with_zeros=False)
    tj, ij = jnp.asarray(t), jnp.asarray(i)

    def loss_xla(t_, i_):
        return jnp.sum(jnp.sin(maxsim_xla(t_, i_, mask_mode=mask_mode)))

    def loss_streaming(t_, i_):
        return jnp.sum(jnp.sin(maxsim_streaming(t_, i_, mask_mode=mask_mode)))

    g1t, g1i = jax.grad(loss_xla, argnums=(0, 1))(tj, ij)
    g2t, g2i = jax.grad(loss_streaming, argnums=(0, 1))(tj, ij)
    np.testing.assert_allclose(np.asarray(g1t), np.asarray(g2t), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g1i), np.asarray(g2i), rtol=1e-4, atol=1e-6)


def test_streaming_int8_close_and_zero_rows_exact(rng):
    """int8 streaming MaxSim: values within quantization noise of the fp
    path; EOT-zeroed text token rows produce EXACT zeros so the 'nonzero'
    masked mean keys identically."""
    from colxlip_tpu.ops.maxsim import maxsim

    def l2n(x):
        return x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-12)

    t = l2n(rng.standard_normal((8, 7, 32)).astype(np.float32))
    t[:, 4:] = 0.0  # zeroed tails
    i = l2n(rng.standard_normal((6, 5, 32)).astype(np.float32))
    t, i = jnp.asarray(t), jnp.asarray(i)
    want = np.asarray(maxsim(t, i, mask_mode="nonzero", impl="streaming"))
    got = np.asarray(maxsim(t, i, mask_mode="nonzero", impl="streaming_int8"))
    assert np.abs(got - want).max() < 0.02, np.abs(got - want).max()


def test_streaming_int8_backward_is_straight_through(rng):
    """int8 forward, fp straight-through backward: grads equal the bf16
    streaming path's for the same cotangent."""
    from colxlip_tpu.ops.maxsim import maxsim

    def l2n(x):
        return x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-12)

    t = jnp.asarray(l2n(rng.standard_normal((8, 7, 32)).astype(np.float32)))
    i = jnp.asarray(l2n(rng.standard_normal((6, 5, 32)).astype(np.float32)))
    ct = jnp.asarray(rng.standard_normal((8, 6)).astype(np.float32))

    _, vjp_q = jax.vjp(
        lambda a, b: maxsim(a, b, mask_mode="plain", impl="streaming_int8"), t, i)
    _, vjp_fp = jax.vjp(
        lambda a, b: maxsim(a, b, mask_mode="plain", impl="streaming"), t, i)
    for gq, gf in zip(vjp_q(ct), vjp_fp(ct)):
        np.testing.assert_allclose(np.asarray(gq), np.asarray(gf),
                                   rtol=1e-5, atol=1e-6)

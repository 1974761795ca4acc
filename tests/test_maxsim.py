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

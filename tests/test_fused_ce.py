"""Fused contrastive CE kernel vs dense oracle (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from colxlip_tpu.losses.clip import cross_entropy_with_integer_labels
from colxlip_tpu.ops.fused_ce import fused_contrastive_ce

from oracles import np_l2norm


def _feats(rng, m=24, n=40, d=32):
    a = jnp.asarray(np_l2norm(rng.standard_normal((m, d))).astype(np.float32))
    b = jnp.asarray(np_l2norm(rng.standard_normal((n, d))).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, n, m).astype(np.int32))
    return a, b, labels


def _dense(a, b, labels, scale):
    logits = scale * a @ b.T
    return cross_entropy_with_integer_labels(logits, labels)


@pytest.mark.parametrize("m,n", [(24, 40), (8, 8), (33, 129)])
def test_fused_ce_forward(rng, m, n):
    a, b, labels = _feats(rng, m, n)
    scale = jnp.float32(30.0)
    got = float(fused_contrastive_ce(a, b, labels, scale,
                                     block_m=8, block_n=128, interpret=True))
    want = float(_dense(a, b, labels, scale))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_fused_ce_gradients(rng):
    a, b, labels = _feats(rng, 16, 24, 16)
    scale = jnp.float32(25.0)

    def loss_f(a_, b_, s_):
        return fused_contrastive_ce(a_, b_, labels, s_,
                                    block_m=8, block_n=128, interpret=True)

    def loss_d(a_, b_, s_):
        return _dense(a_, b_, labels, s_)

    gf = jax.grad(loss_f, argnums=(0, 1, 2))(a, b, scale)
    gd = jax.grad(loss_d, argnums=(0, 1, 2))(a, b, scale)
    np.testing.assert_allclose(np.asarray(gf[0]), np.asarray(gd[0]), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gf[1]), np.asarray(gd[1]), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(float(gf[2]), float(gd[2]), rtol=1e-4)


def test_fused_ce_large_scale_stability(rng):
    """logit_scale near its 100 clamp must not overflow the online sumexp."""
    a, b, labels = _feats(rng, 16, 16)
    got = float(fused_contrastive_ce(a, b, labels, jnp.float32(100.0),
                                     block_m=8, block_n=128, interpret=True))
    want = float(_dense(a, b, labels, jnp.float32(100.0)))
    assert np.isfinite(got)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_fused_ce_symmetric_infonce_matches_clip_loss(rng):
    """Both directions of the fused kernel reproduce clip_loss exactly."""
    from colxlip_tpu.losses import clip_loss

    m = 16
    a, b, _ = _feats(rng, m, m)
    labels = jnp.arange(m, dtype=jnp.int32)
    scale = jnp.float32(40.0)
    fused = (
        fused_contrastive_ce(a, b, labels, scale, block_m=8, block_n=128, interpret=True)
        + fused_contrastive_ce(b, a, labels, scale, block_m=8, block_n=128, interpret=True)
    ) / 2
    np.testing.assert_allclose(float(fused), float(clip_loss(a, b, scale)), rtol=1e-5)

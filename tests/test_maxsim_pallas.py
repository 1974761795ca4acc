"""Pallas MaxSim kernel vs XLA oracle (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from colxlip_tpu.ops.maxsim import maxsim_xla
from colxlip_tpu.ops.maxsim_pallas import maxsim_pallas

from oracles import np_l2norm


def _features(rng, m=16, k=8, lt=7, li=9, d=32, with_zeros=False):
    t = rng.standard_normal((m, lt, d)).astype(np.float32)
    i = rng.standard_normal((k, li, d)).astype(np.float32)
    if with_zeros:
        t[0, 4:] = 0.0
        t[2, 2:] = 0.0
    return jnp.asarray(np_l2norm(t)), jnp.asarray(np_l2norm(i))


@pytest.mark.parametrize("mask_mode", ["nonzero", "plain"])
def test_pallas_forward_matches_xla(rng, mask_mode):
    t, i = _features(rng, with_zeros=(mask_mode == "nonzero"))
    got = np.asarray(maxsim_pallas(t, i, mask_mode=mask_mode,
                                   block_m=8, block_k=8, interpret=True))
    want = np.asarray(maxsim_xla(t, i, mask_mode=mask_mode))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_pallas_forward_unaligned_shapes(rng):
    t, i = _features(rng, m=13, k=5, lt=7, li=9)
    got = np.asarray(maxsim_pallas(t, i, block_m=8, block_k=8, interpret=True))
    want = np.asarray(maxsim_xla(t, i))
    assert got.shape == (13, 5)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_pallas_valid_mask(rng):
    t, i = _features(rng)
    mask = (rng.random((t.shape[0], t.shape[1])) > 0.3).astype(np.float32)
    mask[:, 0] = 1.0
    got = np.asarray(maxsim_pallas(
        t, i, mask_mode="valid", text_mask=jnp.asarray(mask),
        block_m=8, block_k=8, interpret=True,
    ))
    want = np.asarray(maxsim_xla(t, i, mask_mode="valid", text_mask=jnp.asarray(mask)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("mask_mode", ["nonzero", "plain"])
def test_pallas_gradients_match_xla(rng, mask_mode):
    t, i = _features(rng, m=8, k=4, lt=5, li=6, d=16)

    def loss_p(t_, i_):
        return jnp.sum(jnp.sin(maxsim_pallas(
            t_, i_, mask_mode=mask_mode, block_m=4, block_k=4, interpret=True)))

    def loss_x(t_, i_):
        return jnp.sum(jnp.sin(maxsim_xla(t_, i_, mask_mode=mask_mode)))

    gp = jax.grad(loss_p, argnums=(0, 1))(t, i)
    gx = jax.grad(loss_x, argnums=(0, 1))(t, i)
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gx[0]), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gx[1]), rtol=1e-4, atol=1e-6)


def test_pallas_gradients_valid_mask(rng):
    t, i = _features(rng, m=8, k=4, lt=5, li=6, d=16)
    mask = jnp.asarray((rng.random((8, 5)) > 0.3).astype(np.float32))

    def loss_p(t_, i_):
        return jnp.sum(maxsim_pallas(
            t_, i_, mask_mode="valid", text_mask=mask,
            block_m=4, block_k=4, interpret=True))

    def loss_x(t_, i_):
        return jnp.sum(maxsim_xla(t_, i_, mask_mode="valid", text_mask=mask))

    gp = jax.grad(loss_p, argnums=(0, 1))(t, i)
    gx = jax.grad(loss_x, argnums=(0, 1))(t, i)
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gx[0]), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gx[1]), rtol=1e-4, atol=1e-6)


def test_pallas_bf16_inputs(rng):
    t, i = _features(rng, m=16, k=8, lt=7, li=9, d=128)
    got = np.asarray(maxsim_pallas(
        t.astype(jnp.bfloat16), i.astype(jnp.bfloat16),
        block_m=8, block_k=8, interpret=True,
    ))
    want = np.asarray(maxsim_xla(t, i))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)

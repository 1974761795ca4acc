"""Fused MLP kernel: interpret-mode parity vs the XLA reference (fwd + VJP)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from colxlip_tpu.ops.fused_mlp import fused_mlp, fused_mlp_reference


def _setup(rng, b=4, n=24, d=128, h=512, dtype=jnp.float32):
    x = jnp.asarray(rng.standard_normal((b, n, d)) * 0.5, dtype)
    w1 = jnp.asarray(rng.standard_normal((d, h)) * 0.05, dtype)
    b1 = jnp.asarray(rng.standard_normal((h,)) * 0.02, dtype)
    w2 = jnp.asarray(rng.standard_normal((h, d)) * 0.05, dtype)
    b2 = jnp.asarray(rng.standard_normal((d,)) * 0.02, dtype)
    return x, w1, b1, w2, b2


@pytest.mark.parametrize("approximate", [False, True])
def test_forward_matches_reference(rng, approximate):
    args = _setup(rng)
    out = fused_mlp(*args, approximate, 0, True)
    want = fused_mlp_reference(*args, approximate)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("approximate", [False, True])
def test_vjp_matches_reference(rng, approximate):
    args = _setup(rng)

    def loss_k(*a):
        return jnp.sum(jnp.sin(fused_mlp(*a, approximate, 0, True)))

    def loss_r(*a):
        return jnp.sum(jnp.sin(fused_mlp_reference(*a, approximate)))

    gk = jax.grad(loss_k, argnums=(0, 1, 2, 3, 4))(*args)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3, 4))(*args)
    for a, b, name in zip(gk, gr, ["dx", "dw1", "db1", "dw2", "db2"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-4, err_msg=name)


def test_bf16_forward_close(rng):
    args = _setup(rng, dtype=jnp.bfloat16)
    out = fused_mlp(*args, False, 0, True)
    want = fused_mlp_reference(*args, False)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(want, np.float32), atol=3e-2)


def test_block_b_sweep(rng):
    args = _setup(rng, b=8)
    want = fused_mlp_reference(*args, False)
    for bb in (1, 2, 4, 8):
        out = fused_mlp(*args, False, bb, True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                                   atol=1e-5, rtol=1e-5)


def test_non_tpu_without_interpret_raises(rng):
    args = _setup(rng)
    with pytest.raises(RuntimeError, match="requires a TPU backend"):
        fused_mlp(*args)


def test_module_param_layout_matches_fused_inputs(rng):
    """The flax MLP's Dense params map 1:1 onto the kernel's inputs: calling
    fused_mlp with the module's own c_fc/c_proj arrays reproduces the stock
    module output (so the fused dispatch is a drop-in at apply time and
    checkpoints are interchangeable)."""
    import flax.linen as nn  # noqa: F401
    from colxlip_tpu.models.layers import MLP

    m = MLP(dim=128, mlp_ratio=4.0, dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((2, 24, 128)), jnp.float32)
    p = m.init(jax.random.PRNGKey(0), x)
    want = m.apply(p, x)
    pp = p["params"]
    got = fused_mlp(x, pp["c_fc"]["kernel"], pp["c_fc"]["bias"],
                    pp["c_proj"]["kernel"], pp["c_proj"]["bias"],
                    False, 0, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_fused_dispatch_param_tree_identical(monkeypatch, rng):
    """Init under COLXLIP_MLP_IMPL=fused produces the SAME param tree as the
    Dense branch (paths, shapes, dtypes) — interpret-mode init on CPU."""
    from colxlip_tpu.models.layers import MLP
    from colxlip_tpu.ops import fused_mlp as fm

    x = jnp.asarray(rng.standard_normal((2, 24, 128)), jnp.float32)
    m = MLP(dim=128, dtype=jnp.float32)
    p_dense = m.init(jax.random.PRNGKey(0), x)

    monkeypatch.setenv("COLXLIP_MLP_IMPL", "fused")
    # route the kernel through interpret mode for the CPU-side init
    orig = fm._fwd_call
    monkeypatch.setattr(
        fm, "_fwd_call",
        lambda x, w1, b1, w2, b2, approx, bb, interp: orig(
            x, w1, b1, w2, b2, approx, bb, True))
    p_fused = m.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(p_dense) == jax.tree_util.tree_structure(p_fused)
    for a, b in zip(jax.tree.leaves(p_dense), jax.tree.leaves(p_fused)):
        assert a.shape == b.shape and a.dtype == b.dtype
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

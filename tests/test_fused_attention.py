"""Fused packed-QKV attention kernel (ops/fused_attention.py) parity tests.

Run in Pallas interpret mode on the CPU mesh; the hardware path is exercised
by the TPU benchmarks (docs/BENCH.md) and the verify drive. Oracle is the
XLA einsum reference with identical semantics, itself cross-checked against
``jax.nn.dot_product_attention`` (the reference's torch-SDPA analog,
reference transformer.py:161-166).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from colxlip_tpu.ops.fused_attention import fused_mha_packed, fused_mha_reference

SHAPES = [
    # (b, n, heads, hd, causal)
    (4, 197, 12, 768, False),   # vision tower shape (scaled-down batch)
    (4, 77, 8, 512, True),      # text tower shape (causal)
    (2, 50, 12, 768, False),    # ViT-B/32 patch grid
    (3, 16, 4, 128, True),      # odd batch -> block_b falls back to 1
]


def _qkv(b, n, hd, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((b, n, 3 * hd)) * 0.3, dtype)


@pytest.mark.parametrize("b,n,heads,hd,causal", SHAPES)
def test_forward_matches_reference(b, n, heads, hd, causal):
    qkv = _qkv(b, n, hd)
    out = fused_mha_packed(qkv, heads, causal, 0, True)
    ref = fused_mha_reference(qkv, heads, causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("b,n,heads,hd,causal", SHAPES[:2])
def test_grad_matches_reference(b, n, heads, hd, causal):
    qkv = _qkv(b, n, hd, seed=1)
    co = jnp.asarray(
        np.random.default_rng(2).standard_normal((b, n, hd)) * 0.3, jnp.float32)

    def loss(f):
        return lambda x: jnp.sum(f(x) * co)

    g_ker = jax.grad(loss(lambda x: fused_mha_packed(x, heads, causal, 0, True)))(qkv)
    g_ref = jax.grad(loss(lambda x: fused_mha_reference(x, heads, causal)))(qkv)
    scale = float(jnp.abs(g_ref).max())
    np.testing.assert_allclose(
        np.asarray(g_ker), np.asarray(g_ref), atol=3e-5 * max(scale, 1.0))


def test_reference_matches_dot_product_attention():
    """The test oracle itself agrees with jax.nn.dot_product_attention."""
    b, n, heads, hd = 4, 33, 4, 256
    d = hd // heads
    qkv = _qkv(b, n, hd, seed=3)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    expected = jax.nn.dot_product_attention(
        q.reshape(b, n, heads, d), k.reshape(b, n, heads, d),
        v.reshape(b, n, heads, d)).reshape(b, n, hd)
    ref = fused_mha_reference(qkv, heads, False)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(expected), atol=2e-5)


def test_causal_masks_future_positions():
    """Row i of the causal output must not depend on tokens > i."""
    b, n, heads, hd = 2, 12, 2, 64
    qkv = _qkv(b, n, hd, seed=4)
    out = fused_mha_packed(qkv, heads, True, 0, True)
    # perturb the last token: earlier rows must be unchanged
    qkv2 = qkv.at[:, -1, :].add(1.0)
    out2 = fused_mha_packed(qkv2, heads, True, 0, True)
    np.testing.assert_allclose(
        np.asarray(out[:, :-1]), np.asarray(out2[:, :-1]), atol=1e-6)
    assert float(jnp.abs(out[:, -1] - out2[:, -1]).max()) > 1e-3


def test_dispatch_repack_path():
    """ops.attention.multi_head_attention impl='fused' (separate q,k,v entry)
    agrees with the XLA path."""
    jax.config.update("jax_platforms", "cpu")
    from colxlip_tpu.ops import attention as A

    b, n, heads, d = 2, 29, 4, 32
    rng = np.random.default_rng(5)
    q, k, v = (jnp.asarray(rng.standard_normal((b, n, heads, d)) * 0.3,
                           jnp.float32) for _ in range(3))
    # interpret-mode kernel via monkeypatched call (impl='fused' on CPU needs
    # interpret); call the packed kernel directly to mirror the dispatch
    qkv = jnp.concatenate([t.reshape(b, n, heads * d) for t in (q, k, v)], -1)
    out_fused = fused_mha_packed(qkv, heads, False, 0, True).reshape(b, n, heads, d)
    out_xla = A.xla_attention(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out_fused), np.asarray(out_xla), atol=2e-5)


def test_dispatch_cross_attention_falls_back(rng):
    """impl='fused' with differing q/kv lengths (AttentionalPooler, CoCa
    cross-attention) must route to the XLA path, not crash on repack."""
    import jax.numpy as jnp
    from colxlip_tpu.ops.attention import multi_head_attention

    q = jnp.asarray(rng.standard_normal((2, 256, 8, 64)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((2, 197, 8, 64)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((2, 197, 8, 64)), jnp.float32)
    out = multi_head_attention(q, k, v, impl="fused")
    assert out.shape == (2, 256, 8, 64)


def test_dispatch_unknown_impl_raises(rng):
    import jax.numpy as jnp
    import pytest
    from colxlip_tpu.ops.attention import multi_head_attention

    q = jnp.zeros((1, 4, 2, 8))
    with pytest.raises(ValueError, match="unknown attention impl"):
        multi_head_attention(q, q, q, impl="pallas")


def test_fused_on_non_tpu_backend_raises_clearly(rng):
    """Forcing the fused kernel on a non-TPU backend must raise an
    actionable error, not an opaque Mosaic lowering failure (ADVICE r2)."""
    import jax.numpy as jnp
    import pytest
    from colxlip_tpu.ops.attention import multi_head_attention

    q = jnp.zeros((1, 8, 2, 8), jnp.float32)
    with pytest.raises(RuntimeError, match="requires a TPU backend"):
        multi_head_attention(q, q, q, impl="fused")


@pytest.mark.parametrize("causal,n,heads,hd",
                         [(False, 197, 12, 768), (True, 77, 8, 512)])
def test_pipe_order_variant_parity(monkeypatch, causal, n, heads, hd):
    """The software-pipelined emission-order A/B variant
    (COLXLIP_ATTN_ORDER=pipe) must match the reference exactly. Measured
    runtime-identical to head-major on hardware (docs/BENCH.md round-4:
    Mosaic's scheduler canonicalizes emission order), kept as the recorded
    negative closing the emission-order hypothesis."""
    monkeypatch.setenv("COLXLIP_ATTN_ORDER", "pipe")
    qkv = _qkv(4, n, hd, seed=9)
    out = fused_mha_packed(qkv, heads, causal, 0, True)
    ref = fused_mha_reference(qkv, heads, causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("causal,n,heads,head_dim",
                         [(False, 197, 12, 64), (True, 77, 8, 64),
                          (False, 50, 4, 32)])
def test_grid_heads_variant_parity(monkeypatch, causal, n, heads, head_dim):
    """The grid-over-heads A/B variant (COLXLIP_ATTN_GRID=heads) must match
    the reference path exactly, forward and backward (interpret mode)."""
    from colxlip_tpu.ops.fused_attention import (
        _bwd_call_heads,
        _fwd_call_heads,
        fused_mha_reference,
    )

    rng = np.random.default_rng(7)
    b = 4
    qkv = jnp.asarray(
        rng.standard_normal((b, n, 3 * heads * head_dim)).astype(np.float32)
    ) * 0.2
    out = _fwd_call_heads(qkv, heads, causal, 2, True)
    ref = fused_mha_reference(qkv, heads, causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
    dout = jnp.asarray(
        rng.standard_normal(ref.shape).astype(np.float32)) * 0.1
    _, vjp = jax.vjp(lambda q: fused_mha_reference(q, heads, causal), qkv)
    dref = vjp(dout)[0]
    dgot = _bwd_call_heads(qkv, dout, heads, causal, 2, True)
    np.testing.assert_allclose(np.asarray(dgot), np.asarray(dref),
                               atol=1e-4, rtol=1e-4)

"""Fused multi-head attention dispatch: Pallas flash kernel on TPU.

Why: the unfused XLA softmax path materializes the [B, H, N, N] score tensor
in HBM every layer — at ViT-B/16 batch 256 that is ~477 MB fp32 per layer,
and the round-2 profile showed the attention scope eating ~46% of the train
step while holding ~3% of its FLOPs (pure bandwidth). The TPU flash-attention
kernel (jax.experimental.pallas.ops.tpu.flash_attention) streams K/V tiles
through VMEM with an online softmax and never writes the score tensor; its
custom VJP does the same for the backward.

Sequence lengths here are 197 (vision, 224/16 patches + CLS) and 77 (text) —
neither is lane-aligned, so inputs are zero-padded to a multiple of 128 and
masked with segment ids (pad positions get segment 0, valid get 1; the kernel
only attends within equal segments). Output rows for pad queries are sliced
off. Causal masking (text tower) composes with the padding because pads sit
at the end of the sequence.

Replaces the reference's torch SDPA fast path (transformer.py:161-166) with
a TPU-native kernel rather than a translation.
"""
from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp

LANE = 128


def _round_up(n: int, m: int = LANE) -> int:
    return (n + m - 1) // m * m


def resolve_impl(impl: str = "auto") -> str:
    """'auto' resolves to the fused packed-QKV Pallas kernel on TPU
    (ops/fused_attention.py), the XLA path elsewhere.

    Measured round 2 (v5e, ViT-B/16 batch 256 per layer, chained timing):
      - fused packed kernel: fwd 3.6 / fwd+bwd 5.3 ms — and zero [B,H,N,N]
        residuals in HBM, which releases the memory pressure that made XLA
        auto-remat re-execute the MLP fusions (~100 ms/step).
      - XLA fused softmax (jax.nn.dot_product_attention): fwd 5.3 /
        fwd+bwd 10.8 ms.
      - stock pallas flash kernel: ties XLA in isolation at best (20.5 vs
        21.4 ms with tuned blocks) and LOSES 43% end-to-end (283 vs 494
        img/s) from the [B,N,H,D]->[B,H,N,D] transposes it forces around
        every layer. Kept only for long sequences; force with impl='flash'.
    """
    if impl != "auto":
        return impl
    import os

    forced = os.environ.get("COLXLIP_ATTN_IMPL")
    if forced:
        return forced
    if jax.default_backend() == "tpu":
        return "fused"
    return "xla"


def xla_attention(q, k, v, *, mask=None, causal: bool = False):
    """Reference path: jax.nn.dot_product_attention (XLA-fused softmax).

    bias and is_causal COMPOSE (a pad bias plus causal masking must not
    silently turn bidirectional — the old `causal and mask is None` did
    exactly that)."""
    return jax.nn.dot_product_attention(
        q, k, v, bias=mask, is_causal=causal
    )


def _manual_attention(q, k, v, *, causal: bool, probs_dtype):
    """Hand-rolled attention: softmax in fp32, probabilities STORED in
    ``probs_dtype``. With bf16 probs the [B,H,N,N] residual halves — closer
    to the reference's fp16-AMP SDPA numerics than fp32 storage."""
    b, n, h, dh = q.shape
    scale = 1.0 / math.sqrt(dh)
    logits = jnp.einsum(
        "bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32) * scale
    if causal:
        mask = jnp.tril(jnp.ones((n, k.shape[1]), bool))
        logits = jnp.where(mask[None, None], logits, -jnp.inf)
    probs = jax.nn.softmax(logits, axis=-1).astype(probs_dtype)
    return jnp.einsum("bhnm,bmhd->bnhd", probs, v)


def xla_bf16_attention(q, k, v, *, causal: bool = False):
    return _manual_attention(q, k, v, causal=causal, probs_dtype=jnp.bfloat16)


@functools.partial(jax.checkpoint,
                   policy=jax.checkpoint_policies.nothing_saveable,
                   static_argnums=(3,))
def _remat_core(q, k, v, causal):
    return jax.nn.dot_product_attention(q, k, v, is_causal=causal)


def xla_remat_attention(q, k, v, *, causal: bool = False):
    """Attention with flash-style memory semantics in plain XLA: nothing is
    saved between fwd and bwd (the [B,H,N,N] tensors are recomputed once in
    the backward), shrinking the residual set by ~1-2 GB/layer at ViT-B
    batch 256."""
    return _remat_core(q, k, v, causal)


def flash_attention_bnhd(q, k, v, *, causal: bool = False):
    """Flash attention over flax-layout tensors.

    q: [B, N, H, D], k/v: [B, M, H, D] -> [B, N, H, D].
    Pads N/M up to a 128 multiple with segment-id masking.
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    b, n, h, d = q.shape
    m = k.shape[1]
    scale = 1.0 / math.sqrt(d)

    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)

    n_pad, m_pad = _round_up(n), _round_up(m)
    segment_ids = None
    if n_pad != n or m_pad != m:
        qt = jnp.pad(qt, ((0, 0), (0, 0), (0, n_pad - n), (0, 0)))
        kt = jnp.pad(kt, ((0, 0), (0, 0), (0, m_pad - m), (0, 0)))
        vt = jnp.pad(vt, ((0, 0), (0, 0), (0, m_pad - m), (0, 0)))
        q_seg = jnp.broadcast_to(
            (jnp.arange(n_pad) < n).astype(jnp.int32)[None], (b, n_pad))
        kv_seg = jnp.broadcast_to(
            (jnp.arange(m_pad) < m).astype(jnp.int32)[None], (b, m_pad))
        segment_ids = SegmentIds(q=q_seg, kv=kv_seg)

    # tuned on v5e (ViT-B shapes): full-sequence q/k blocks, batch-block 8.
    # The stock kernel asserts block divisibility, so clamp to the largest
    # 128-multiple divisor <= 512 (n_pad/m_pad are always 128-multiples)
    def _divisor_block(padded):
        b = min(512, padded)
        while padded % b:
            b -= 128
        return b

    bs = _divisor_block(n_pad)
    bsk = _divisor_block(m_pad)
    blocks = BlockSizes(
        block_q=bs, block_k_major=bsk, block_k=bsk, block_b=min(8, b),
        block_q_major_dkv=bs, block_k_major_dkv=bsk, block_k_dkv=bsk,
        block_q_dkv=bs, block_k_major_dq=bsk, block_k_dq=bsk, block_q_dq=bs,
    )
    out = flash_attention(
        qt, kt, vt, segment_ids=segment_ids, causal=causal, sm_scale=scale,
        block_sizes=blocks,
    )
    return out[:, :, :n].transpose(0, 2, 1, 3)


def multi_head_attention(
    q, k, v,
    *,
    mask: Optional[jnp.ndarray] = None,
    causal: bool = False,
    impl: str = "auto",
):
    """[B, N, H, D] attention with TPU flash dispatch.

    Explicit additive masks (CoCa pad-aware decoding) always take the XLA
    path; the flash kernel covers the no-mask and causal cases that dominate
    the CLIP towers.
    """
    impl = resolve_impl(impl)
    known = {"fused", "flash", "xla", "xla_bf16", "xla_remat"}
    if impl not in known:
        # a typo'd COLXLIP_ATTN_IMPL silently benchmarking the wrong path is
        # exactly how round-2 perf numbers go wrong — fail loudly
        raise ValueError(f"unknown attention impl {impl!r}; one of {sorted(known)}")
    if mask is None:
        # the Pallas kernel's grid/block choice is a function of the concrete
        # shape; under jax.export symbolic dims (serving/aot.py symbolic
        # batch) fall through to the shape-polymorphic XLA path
        concrete = all(isinstance(s, int) for s in q.shape)
        if (impl == "fused" and concrete
                and q.shape[1] == k.shape[1] == v.shape[1]):
            # repack to [B, N, 3*H*D] for the packed kernel (self-attention
            # only: the kernel derives one N from the packed tensor, so
            # cross-attention — AttentionalPooler, CoCa — with differing
            # q/kv lengths must take the XLA path below). Callers on the
            # hot path (models/layers.py MultiHeadAttention) hand the packed
            # in_proj output to fused_mha_packed directly and skip this copy.
            from .fused_attention import fused_mha_packed

            b, n, h, dh = q.shape
            qkv = jnp.concatenate(
                [t.reshape(b, n, h * dh) for t in (q, k, v)], axis=-1)
            return fused_mha_packed(qkv, h, causal).reshape(b, n, h, dh)
        if impl == "flash":
            return flash_attention_bnhd(q, k, v, causal=causal)
        if impl == "xla_bf16":
            return xla_bf16_attention(q, k, v, causal=causal)
        if impl == "xla_remat":
            return xla_remat_attention(q, k, v, causal=causal)
    return xla_attention(q, k, v, mask=mask, causal=causal)

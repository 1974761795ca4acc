"""CoCa loss: contrastive + captioning cross-entropy.

Counterpart of reference ``CoCaLoss`` (src/colxlip/loss.py:298-340):
clip_loss_weight * InfoNCE + caption_loss_weight * CE(logits, labels) with
pad-id positions ignored in the caption CE.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .clip import clip_loss


def caption_cross_entropy(
    logits: jnp.ndarray, labels: jnp.ndarray, *, ignore_index: int = 0
) -> jnp.ndarray:
    """Token-level CE over [B, L, V] logits, ignoring pad positions."""
    logits = logits.astype(jnp.float32)
    lse = jax.scipy.special.logsumexp(logits, axis=-1)
    true_logit = jnp.take_along_axis(logits, labels[..., None], axis=-1)[..., 0]
    per_tok = lse - true_logit
    valid = (labels != ignore_index).astype(jnp.float32)
    return jnp.sum(per_tok * valid) / jnp.maximum(jnp.sum(valid), 1.0)


def coca_loss(
    image_features: jnp.ndarray,
    text_features: jnp.ndarray,
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    logit_scale: jnp.ndarray,
    *,
    caption_loss_weight: float = 2.0,
    clip_loss_weight: float = 1.0,
    pad_id: int = 0,
    axis_name: Optional[str] = None,
    local_loss: bool = False,
    gather_with_grad: bool = False,
    output_dict: bool = False,
    ce_impl: str = "dense",
    caption_hidden: Optional[jnp.ndarray] = None,
    caption_head_kernel: Optional[jnp.ndarray] = None,
):
    """ce_impl='fused' + caption_hidden/kernel streams the caption CE through
    ops/vocab_ce.py (head matmul fused into the loss; the [B, L, V] logits —
    which OOM the chip at batch 256 — are never materialized and the dense
    ``logits`` input is dead-code-eliminated under jit)."""
    if clip_loss_weight:
        contrastive = clip_loss_weight * clip_loss(
            image_features, text_features, logit_scale,
            axis_name=axis_name, local_loss=local_loss,
            gather_with_grad=gather_with_grad,
        )
    else:
        contrastive = jnp.zeros((), jnp.float32)
    if (ce_impl == "fused" and caption_hidden is not None
            and caption_head_kernel is not None):
        from ..ops.vocab_ce import streaming_vocab_ce

        caption = caption_loss_weight * streaming_vocab_ce(
            caption_hidden, caption_head_kernel, labels, pad_id)
    else:
        caption = caption_loss_weight * caption_cross_entropy(
            logits, labels, ignore_index=pad_id
        )
    if output_dict:
        return {"contrastive_loss": contrastive, "caption_loss": caption}
    return contrastive, caption

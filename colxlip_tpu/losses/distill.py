"""Distillation loss: InfoNCE + teacher-softened cross-entropy.

Counterpart of reference ``DistillClipLoss`` (src/colxlip/loss.py:343-379).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .clip import clip_logits, contrastive_labels, cross_entropy_with_integer_labels


def _soft_ce(teacher_logits: jnp.ndarray, student_logits: jnp.ndarray) -> jnp.ndarray:
    """-(softmax(teacher) * log_softmax(student)).sum(1).mean(0)  (loss.py:345-346)."""
    t = jax.nn.softmax(teacher_logits.astype(jnp.float32), axis=1)
    s = jax.nn.log_softmax(student_logits.astype(jnp.float32), axis=1)
    return -jnp.sum(t * s, axis=1).mean()


def distill_clip_loss(
    image_features: jnp.ndarray,
    text_features: jnp.ndarray,
    logit_scale: jnp.ndarray,
    dist_image_features: jnp.ndarray,
    dist_text_features: jnp.ndarray,
    dist_logit_scale: jnp.ndarray,
    *,
    axis_name: Optional[str] = None,
    local_loss: bool = False,
    gather_with_grad: bool = False,
    output_dict: bool = False,
):
    kw = dict(axis_name=axis_name, local_loss=local_loss, gather_with_grad=gather_with_grad)
    logits_per_image, logits_per_text = clip_logits(
        image_features, text_features, logit_scale, **kw
    )
    dist_logits_per_image, dist_logits_per_text = clip_logits(
        jax.lax.stop_gradient(dist_image_features),
        jax.lax.stop_gradient(dist_text_features),
        dist_logit_scale, **kw,
    )
    labels = contrastive_labels(
        logits_per_image.shape[0], axis_name=axis_name, local_loss=local_loss
    )
    contrastive_loss = (
        cross_entropy_with_integer_labels(logits_per_image, labels)
        + cross_entropy_with_integer_labels(logits_per_text, labels)
    ) / 2
    distill_loss = (
        _soft_ce(dist_logits_per_image, logits_per_image)
        + _soft_ce(dist_logits_per_text, logits_per_text)
    ) / 2
    if output_dict:
        return {"contrastive_loss": contrastive_loss, "distill_loss": distill_loss}
    return contrastive_loss, distill_loss

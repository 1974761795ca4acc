"""Global-batch InfoNCE (CLIP) loss.

Counterpart of reference ``ClipLoss`` (src/colxlip/loss.py:95-182), written as
a pure function for use inside shard_map over the data mesh axis (or
single-device with axis_name=None).

  - full-logits mode (reference default): every device computes the identical
    N_global x N_global logit matrix from gathered features; gradients reach
    only the local shard unless gather_with_grad (loss.py:148-149).
  - local_loss mode: each device keeps its own b x N_global logit rows with
    labels offset by rank*b (loss.py:123-124,144-146) — the GSPMD-natural
    sharded-logits form; O(b*N) instead of O(N^2) memory per device.

Cross-entropy runs in fp32 via logsumexp regardless of feature dtype.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..parallel.collectives import gather_pair


def cross_entropy_with_integer_labels(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean CE over rows, fp32 (torch F.cross_entropy semantics)."""
    logits = logits.astype(jnp.float32)
    lse = jax.scipy.special.logsumexp(logits, axis=-1)
    true_logit = jnp.take_along_axis(logits, labels[:, None], axis=-1)[:, 0]
    return jnp.mean(lse - true_logit)


def contrastive_labels(
    num_logits: int, *, axis_name: Optional[str], local_loss: bool
) -> jnp.ndarray:
    """arange labels, offset by rank*b in local-loss mode (loss.py:119-130)."""
    labels = jnp.arange(num_logits, dtype=jnp.int32)
    if axis_name is not None and local_loss:
        labels = labels + num_logits * jax.lax.axis_index(axis_name)
    return labels


def clip_logits(
    image_features: jnp.ndarray,
    text_features: jnp.ndarray,
    logit_scale: jnp.ndarray,
    *,
    axis_name: Optional[str] = None,
    local_loss: bool = False,
    gather_with_grad: bool = False,
    logit_bias: Optional[jnp.ndarray] = None,
):
    """(logits_per_image, logits_per_text) — reference loss.py:132-158."""
    if axis_name is not None:
        all_image, all_text = gather_pair(
            image_features, text_features,
            axis_name=axis_name, gather_with_grad=gather_with_grad,
            local_loss=local_loss,
        )
        if local_loss:
            logits_per_image = logit_scale * _matmul_t(image_features, all_text)
            logits_per_text = logit_scale * _matmul_t(text_features, all_image)
        else:
            logits_per_image = logit_scale * _matmul_t(all_image, all_text)
            logits_per_text = logits_per_image.T
    else:
        logits_per_image = logit_scale * _matmul_t(image_features, text_features)
        logits_per_text = logits_per_image.T
    if logit_bias is not None:
        logits_per_image = logits_per_image + logit_bias
        logits_per_text = logits_per_text + logit_bias
    return logits_per_image, logits_per_text


def _matmul_t(a, b):
    return jnp.einsum("id,jd->ij", a, b, preferred_element_type=jnp.float32)


def clip_loss(
    image_features: jnp.ndarray,
    text_features: jnp.ndarray,
    logit_scale: jnp.ndarray,
    *,
    axis_name: Optional[str] = None,
    local_loss: bool = False,
    gather_with_grad: bool = False,
    logit_bias: Optional[jnp.ndarray] = None,
    ce_impl: str = "dense",
    output_dict: bool = False,
):
    """Symmetric InfoNCE (reference loss.py:160-182).

    ce_impl='fused' streams the logit matrix through the Pallas fused
    matmul+logsumexp kernel (ops/fused_ce.py) — O(N*D) memory instead of the
    O(N^2) dense matrix the reference materializes; required for 32k-global
    batches. Dense mode reproduces the reference exactly (incl. logit_bias).
    """
    if ce_impl == "fused":
        if logit_bias is not None:  # not an assert: python -O must not
            # silently drop the bias from the loss
            raise ValueError("fused CE path does not support logit_bias; "
                             "use the dense path for biased logits")
        from ..ops.fused_ce import fused_contrastive_ce

        if axis_name is not None:
            all_image, all_text = gather_pair(
                image_features, text_features,
                axis_name=axis_name, gather_with_grad=gather_with_grad,
                local_loss=local_loss,
            )
            if local_loss:
                rows_i, rows_t = image_features, text_features
                cols_t, cols_i = all_text, all_image
            else:
                rows_i, rows_t = all_image, all_text
                cols_t, cols_i = all_text, all_image
        else:
            rows_i, rows_t = image_features, text_features
            cols_t, cols_i = text_features, image_features
        labels = contrastive_labels(
            rows_i.shape[0], axis_name=axis_name, local_loss=local_loss
        )
        total = (
            fused_contrastive_ce(rows_i, cols_t, labels, logit_scale)
            + fused_contrastive_ce(rows_t, cols_i, labels, logit_scale)
        ) / 2
        return {"total_loss": total} if output_dict else total

    logits_per_image, logits_per_text = clip_logits(
        image_features, text_features, logit_scale,
        axis_name=axis_name, local_loss=local_loss,
        gather_with_grad=gather_with_grad, logit_bias=logit_bias,
    )
    labels = contrastive_labels(
        logits_per_image.shape[0], axis_name=axis_name, local_loss=local_loss
    )
    total = (
        cross_entropy_with_integer_labels(logits_per_image, labels)
        + cross_entropy_with_integer_labels(logits_per_text, labels)
    ) / 2
    return {"total_loss": total} if output_dict else total

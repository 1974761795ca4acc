"""ColXLIP loss: alpha-mixed global InfoNCE + token-level MaxSim InfoNCE.

Counterpart of reference ``ColClipLoss`` (src/colxlip/loss.py:184-296):
  total = alpha * CE(global logits) + (1 - alpha) * CE(token MaxSim logits)

Distributed behavior:
  - full mode (reference default): gathers pooled AND token features across
    the data axis (loss.py:225-243) and computes full N x N matrices on every
    device. Token gather moves [b,77,D]+[b,Li,D] per device over ICI.
  - local_loss mode: the reference raises NotImplementedError here
    (loss.py:246-248). We implement it properly as the sharded-logits form:
    each device computes its own b x N rows for BOTH directions —
      text rows : maxsim(T_local,  I_global)            -> [b, N]
      image rows: maxsim(T_global, I_local).T           -> [b, N]
    with labels offset by rank*b. This is the memory-scalable form for large
    global batches (O(b*N) logits instead of O(N^2)).

The MaxSim masked-mean semantics ('nonzero') follow loss.py:37-44 exactly —
see ops/maxsim.py for the discussion of the zeroed-then-projected text tokens.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ..ops.maxsim import maxsim
from ..parallel.collectives import gather_features, gather_pair
from .clip import contrastive_labels, cross_entropy_with_integer_labels, _matmul_t


def colclip_loss(
    image_features: jnp.ndarray,
    text_features: jnp.ndarray,
    token_image_features: jnp.ndarray,
    token_text_features: jnp.ndarray,
    logit_scale: jnp.ndarray,
    *,
    alpha: float = 0.5,
    axis_name: Optional[str] = None,
    local_loss: bool = False,
    gather_with_grad: bool = False,
    logit_bias: Optional[jnp.ndarray] = None,
    maxsim_impl: str = "auto",
    mask_mode: str = "nonzero",
    output_dict: bool = True,
):
    gkw = dict(axis_name=axis_name, gather_with_grad=gather_with_grad, local_loss=local_loss)

    if axis_name is not None and local_loss:
        # Sharded-logits form (the reference's missing local_loss branch).
        all_image, all_text = gather_pair(image_features, text_features, **gkw)
        all_tok_image = gather_features(token_image_features, **gkw)
        all_tok_text = gather_features(token_text_features, **gkw)

        logits_per_image = logit_scale * _matmul_t(image_features, all_text)
        logits_per_text = logit_scale * _matmul_t(text_features, all_image)
        # S[m, k] rows for local texts over all images:
        s_text = maxsim(token_text_features, all_tok_image, mask_mode=mask_mode, impl=maxsim_impl)
        # columns for local images over all texts, transposed into rows:
        s_image = maxsim(all_tok_text, token_image_features, mask_mode=mask_mode, impl=maxsim_impl).T
        logits_per_text_token = logit_scale * s_text
        logits_per_image_token = logit_scale * s_image
        num_logits = logits_per_image.shape[0]
    elif axis_name is not None:
        all_image, all_text = gather_pair(image_features, text_features, **gkw)
        all_tok_image = gather_features(token_image_features, **gkw)
        all_tok_text = gather_features(token_text_features, **gkw)
        logits_per_image = logit_scale * _matmul_t(all_image, all_text)
        logits_per_text = logits_per_image.T
        s = maxsim(all_tok_text, all_tok_image, mask_mode=mask_mode, impl=maxsim_impl)
        logits_per_text_token = logit_scale * s
        logits_per_image_token = logits_per_text_token.T
        num_logits = logits_per_image.shape[0]
    else:
        logits_per_image = logit_scale * _matmul_t(image_features, text_features)
        logits_per_text = logits_per_image.T
        s = maxsim(token_text_features, token_image_features, mask_mode=mask_mode, impl=maxsim_impl)
        logits_per_text_token = logit_scale * s
        logits_per_image_token = logits_per_text_token.T
        num_logits = logits_per_image.shape[0]

    if logit_bias is not None:
        logits_per_image = logits_per_image + logit_bias
        logits_per_text = logits_per_text + logit_bias

    labels = contrastive_labels(num_logits, axis_name=axis_name, local_loss=local_loss)
    global_contrastive_loss = (
        cross_entropy_with_integer_labels(logits_per_image, labels)
        + cross_entropy_with_integer_labels(logits_per_text, labels)
    ) / 2
    token_contrastive_loss = (
        cross_entropy_with_integer_labels(logits_per_image_token, labels)
        + cross_entropy_with_integer_labels(logits_per_text_token, labels)
    ) / 2
    total = alpha * global_contrastive_loss + (1 - alpha) * token_contrastive_loss
    if output_dict:
        return {
            "global_contrastive_loss": global_contrastive_loss,
            "token_contrastive_loss": token_contrastive_loss,
            "total_loss": total,
        }
    return total

"""SigLIP pairwise sigmoid loss with ring-exchanged negatives.

Counterpart of reference ``SigLipLoss`` (src/colxlip/loss.py:470-604). The
reference implements four distributed negative-exchange strategies over NCCL
P2P with hand-written autograd (loss.py:382-467); on TPU every one of them
maps onto ``jax.lax.ppermute`` rings over ICI, whose VJP is the reverse
permutation for free:

  - 'bidir'  : both ring directions per step, (world-1)//2 steps (+ remainder)
               — loss.py:525-559. Uses full bidirectional ICI bandwidth.
  - 'shift'  : single-direction ring, world-1 steps — loss.py:560-577.
  - 'reduce' : masked all-reduce broadcast of each rank's text — loss.py:578-590.
  - 'gather' : all_gather then loop — loss.py:591-600.

``axis_size`` must be the static mesh axis size (shard_map knows it).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _pairwise_sigmoid_loss(
    image_features, text_features, logit_scale, logit_bias, *, negative_only=False
):
    """-sum(logsigmoid(labels * logits)) / b  (reference loss.py:498-519)."""
    logits = logit_scale * jnp.einsum(
        "id,jd->ij", image_features, text_features, preferred_element_type=jnp.float32
    )
    if logit_bias is not None:
        logits = logits + logit_bias
    b = image_features.shape[0]
    labels = -jnp.ones((b, b), dtype=logits.dtype)
    if not negative_only:
        labels = labels + 2 * jnp.eye(b, dtype=logits.dtype)
    return -jnp.sum(jax.nn.log_sigmoid(labels * logits)) / b


from ..parallel.collectives import ring_shift as _ring_permute


def siglip_loss(
    image_features: jnp.ndarray,
    text_features: jnp.ndarray,
    logit_scale: jnp.ndarray,
    logit_bias: Optional[jnp.ndarray] = None,
    *,
    axis_name: Optional[str] = None,
    axis_size: Optional[int] = None,
    dist_impl: str = "bidir",
    output_dict: bool = False,
):
    loss = _pairwise_sigmoid_loss(image_features, text_features, logit_scale, logit_bias)

    if axis_name is not None and axis_size is None:
        axis_size = jax.lax.axis_size(axis_name)
    if axis_name is not None and axis_size > 1:
        if dist_impl == "bidir":
            t_left = t_right = text_features
            num_bidir, remainder = divmod(axis_size - 1, 2)
            for _ in range(num_bidir):
                # to_left means the left neighbor receives it (shift -1);
                # to_right goes to rank+1. Both directions ride ICI at once.
                t_left = _ring_permute(t_left, axis_name, -1)
                t_right = _ring_permute(t_right, axis_name, +1)
                for f in (t_right, t_left):
                    loss += _pairwise_sigmoid_loss(
                        image_features, f, logit_scale, logit_bias, negative_only=True
                    )
            if remainder:
                t = _ring_permute(t_right, axis_name, +1)
                loss += _pairwise_sigmoid_loss(
                    image_features, t, logit_scale, logit_bias, negative_only=True
                )
        elif dist_impl == "shift":
            t = text_features
            for _ in range(axis_size - 1):
                t = _ring_permute(t, axis_name, +1)
                loss += _pairwise_sigmoid_loss(
                    image_features, t, logit_scale, logit_bias, negative_only=True
                )
        elif dist_impl == "reduce":
            rank = jax.lax.axis_index(axis_name)
            for i in range(axis_size):
                t_from_i = jax.lax.psum(
                    text_features * (rank == i).astype(text_features.dtype), axis_name
                )
                loss += jnp.where(i != rank, 1.0, 0.0) * _pairwise_sigmoid_loss(
                    image_features, t_from_i, logit_scale, logit_bias, negative_only=True
                )
        elif dist_impl == "gather":
            rank = jax.lax.axis_index(axis_name)
            all_text = jax.lax.all_gather(text_features, axis_name, axis=0)
            for i in range(axis_size):
                loss += jnp.where(i != rank, 1.0, 0.0) * _pairwise_sigmoid_loss(
                    image_features, all_text[i], logit_scale, logit_bias, negative_only=True
                )
        else:
            raise ValueError(f"unknown dist_impl: {dist_impl!r}")

    return {"contrastive_loss": loss} if output_dict else loss

"""Cross-device feature gathering for global-batch contrastive losses.

TPU-native counterpart of the reference's ``gather_features``
(src/colxlip/loss.py:48-92). The reference drives NCCL explicitly
(torch.distributed.nn.all_gather for the differentiable path, plain
dist.all_gather + local-rank splice otherwise). Here the losses run inside
``shard_map`` over the data axis of a ``jax.sharding.Mesh`` and collectives
ride ICI via ``jax.lax.all_gather``:

  - gather_with_grad=True  : lax.all_gather is differentiable by construction
    (its VJP is a psum-scatter of the gradient slices) — matching
    torch.distributed.nn.all_gather (loss.py:77-79).
  - gather_with_grad=False : gather stop_gradient'd features, then splice this
    device's differentiable shard back in at rank*b, so gradients only flow
    through local features — matching the reference default (loss.py:80-90).

``axis_name=None`` degrades to the single-process path (loss.py:258-263).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def axis_rank(axis_name) -> jnp.ndarray:
    return jax.lax.axis_index(axis_name)


def ring_shift(x, axis_name, shift: int = 1):
    """Move each device's x to (rank + shift) % world over the ICI ring."""
    n = jax.lax.axis_size(axis_name)
    return jax.lax.ppermute(x, axis_name, [(i, (i + shift) % n) for i in range(n)])


def gather_features(
    features: jnp.ndarray,
    *,
    axis_name: Optional[str],
    gather_with_grad: bool = False,
    local_loss: bool = False,
) -> jnp.ndarray:
    """All-gather [b, ...] -> [world*b, ...] along the leading axis.

    With gather_with_grad=False and local_loss=False, the local shard is
    spliced back in so it keeps gradients (reference loss.py:85-90). With
    local_loss=True the gathered copy is entirely non-differentiable — each
    device backprops only through the features appearing in its own logit
    rows (reference loss.py:144-146 uses the raw local tensors for those).
    """
    if axis_name is None:
        return features
    if gather_with_grad:
        return jax.lax.all_gather(features, axis_name, axis=0, tiled=True)
    gathered = jax.lax.all_gather(
        jax.lax.stop_gradient(features), axis_name, axis=0, tiled=True
    )
    if local_loss:
        return gathered
    rank = jax.lax.axis_index(axis_name)
    b = features.shape[0]
    start = (rank * b,) + (0,) * (features.ndim - 1)
    return jax.lax.dynamic_update_slice(gathered, features, start)


def gather_pair(
    image_features: jnp.ndarray,
    text_features: jnp.ndarray,
    *,
    axis_name: Optional[str],
    gather_with_grad: bool = False,
    local_loss: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Gather both feature tensors (reference loss.py:48-92 call shape)."""
    kw = dict(
        axis_name=axis_name, gather_with_grad=gather_with_grad, local_loss=local_loss
    )
    return gather_features(image_features, **kw), gather_features(text_features, **kw)

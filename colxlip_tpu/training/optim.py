"""Optimizer construction: AdamW with the reference's weight-decay exclusions.

Counterpart of reference src/main.py:280-295: parameters with ndim < 2, or
whose name contains 'bn' / 'ln' / 'bias' / 'logit_scale', get no weight decay
(gain-or-bias set); the rest get full AdamW decay. Per-arch defaults (ViT ->
beta2=0.98, eps=1e-6) mirror params.py:12-18 and are applied by the caller.

On TPU there is no GradScaler: params/optimizer state are fp32, compute bf16.
"""
from __future__ import annotations

from typing import Callable, Optional, Union

import jax
import optax


def _is_no_decay(path, leaf) -> bool:
    names = [getattr(k, "key", str(k)).lower() for k in path]
    joined = "/".join(names)
    if leaf.ndim < 2:
        return True
    return any(t in joined for t in ("bn", "ln_", "ln1", "ln2", "bias", "logit_scale", "norm"))


def decay_mask(params):
    """True where weight decay applies (reference main.py:284-286 'rest')."""
    flat = jax.tree_util.tree_map_with_path(
        lambda path, leaf: not _is_no_decay(path, leaf), params
    )
    return flat


def freeze_mask(params, frozen_prefixes: tuple):
    """True where the parameter is trainable; False under a frozen tower.

    The TPU-native analog of the reference's ``--lock-image``/``--lock-text``
    (requires_grad=False over a tower, transformer.py:630-664 lock()): frozen
    subtrees get zeroed updates, so they stay at their loaded values.
    """
    def trainable(path, leaf):
        names = [getattr(k, "key", str(k)) for k in path]
        return not any(p in names for p in frozen_prefixes)
    return jax.tree_util.tree_map_with_path(trainable, params)


def create_optimizer(
    learning_rate: Union[float, Callable],
    *,
    beta1: float = 0.9,
    beta2: float = 0.98,
    eps: float = 1e-6,
    weight_decay: float = 0.2,
    grad_clip_norm: Optional[float] = None,
    lock_image: bool = False,
    lock_text: bool = False,
) -> optax.GradientTransformation:
    tx = optax.adamw(
        learning_rate=learning_rate,
        b1=beta1,
        b2=beta2,
        eps=eps,
        weight_decay=weight_decay,
        mask=decay_mask,
    )
    if grad_clip_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip_norm), tx)
    frozen = tuple(
        p for p, on in (("visual", lock_image), ("text", lock_text)) if on
    )
    if frozen:
        # mask the WHOLE chain, matching the reference's requires_grad=False
        # exclusion: frozen grads must not inflate the global clip norm
        # (masked-out leaves become MaskedNode, invisible to
        # clip_by_global_norm), and Adam must not allocate mu/nu for the
        # frozen tower (~2.4 GB of dead fp32 state for a locked ViT-L — the
        # chip sits at the HBM cliff). optax.masked passes masked-out
        # updates through UNCHANGED, so the frozen side still needs the
        # explicit zero.
        trainable = lambda params: freeze_mask(params, frozen)  # noqa: E731
        tx = optax.chain(
            optax.masked(tx, trainable),
            optax.masked(optax.set_to_zero(),
                         lambda params: jax.tree.map(
                             lambda x: not x, trainable(params))),
        )
    return tx

"""Single-chip measurement of the pod-scale colclip operating point.

The v5e-64 recipes (scripts/train_merged30m_v5e64.sh, train_vitl14_v5e64.sh)
run ``--local-loss --token-dist ring --token-neighborhood K
--gather-with-grad`` at batch b per chip across M chips. Each chip's step
compute there is:

  - towers fwd/bwd on the b local pairs;
  - pooled InfoNCE: [b, M*b] logit rows in BOTH directions + backward
    (the sharded-logits local_loss form, losses/colclip.py:160-169);
  - token CE: a K-step ring scan of block MaxSims per direction
    (losses/colclip.py:37-122) + backward including the gradients w.r.t.
    the remote blocks (gather_with_grad semantics — those grads ride the
    reversed ring in the real run);

minus only the ICI transport (ppermute/all-gather), which overlaps compute
on the pod. This module reproduces that per-chip compute exactly on ONE
chip so ``bench.py --pod-devices M`` measures the true img/s/chip of the
recipe shape instead of projecting it (the round-4 gap): remote feature
blocks are substituted with rolled copies of the local block — distinct
row permutations, so XLA cannot CSE the block MaxSims or factor the bank
matmuls — and the loss math (CE layouts, labels, scan structure) is the
same code shape as the mesh loss, which tests/test_pod_shape.py pins by
feeding TRUE per-rank blocks and matching the 8-device mesh loss exactly.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..losses.clip import cross_entropy_with_integer_labels, _matmul_t
from ..ops.maxsim import maxsim
from .train_step import (
    TrainState,
    TrainStepConfig,
    _clamp_logit_scale,
    build_forward,
    optax_global_norm,
)


def _blockwise_rows(local, blocks, *, transpose: bool, maxsim_impl: str,
                    mask_mode: str, window_mode: str = "scan"):
    """[b_rows, K*b] MaxSim rows over K key/query blocks.

    window_mode='scan': a lax.scan over the blocks — the single-chip analog
    of losses/colclip.py:_ring_maxsim_rows (same one compiled block body,
    same slot layout: slot s is block s, positives on the slot-0 diagonal).

    window_mode='fused': flatten the K blocks into one [K*b, L, D] tensor
    and make ONE maxsim call — the analog of all-gathering the capped
    neighborhood in one collective instead of ring-scanning it (the window
    is K*b*L*D bytes, e.g. 411 MB at the v5e-64 recipe shape — feasible,
    unlike the full global gather). Same math, same slot layout; the A/B
    decides which form the recipes should run.
    """
    k, b_block = blocks.shape[0], blocks.shape[1]
    b_rows = local.shape[0]

    if window_mode == "fused":
        window = blocks.reshape(k * b_block, *blocks.shape[2:])
        if not transpose:
            return maxsim(local, window, mask_mode=mask_mode,
                          impl=maxsim_impl).astype(jnp.float32)
        return maxsim(window, local, mask_mode=mask_mode,
                      impl=maxsim_impl).T.astype(jnp.float32)

    def body(cols, xs):
        s, block = xs
        if not transpose:
            rows = maxsim(local, block, mask_mode=mask_mode, impl=maxsim_impl)
        else:
            rows = maxsim(block, local, mask_mode=mask_mode,
                          impl=maxsim_impl).T
        cols = jax.lax.dynamic_update_slice(
            cols, rows.astype(cols.dtype), (0, s * b_block))
        return cols, None

    cols0 = jnp.zeros((b_rows, k * b_block), jnp.float32)
    cols, _ = jax.lax.scan(body, cols0, (jnp.arange(k), blocks))
    return cols


def pod_shape_loss(
    image_features: jnp.ndarray,          # [b, D] local
    text_features: jnp.ndarray,           # [b, D] local
    token_image_features: jnp.ndarray,    # [b, Li, D] local
    token_text_features: jnp.ndarray,     # [b, Lt, D] local
    logit_scale: jnp.ndarray,
    *,
    all_image: jnp.ndarray,               # [M*b, D] pooled image bank
    all_text: jnp.ndarray,                # [M*b, D] pooled text bank
    tok_image_blocks: jnp.ndarray,        # [K, b, Li, D] ring window, slot 0
    tok_text_blocks: jnp.ndarray,         # [K, b, Lt, D]   = the local block
    alpha: float = 0.5,
    maxsim_impl: str = "auto",
    mask_mode: str = "nonzero",
    label_offset: int = 0,                # rank*b in the real layout
    window_mode: str = "scan",            # 'scan' (ring) | 'fused' (gather)
    output_dict: bool = True,
):
    """The per-chip loss of the local_loss+ring(+neighborhood) operating
    point, with the collective-produced banks passed in explicitly.

    Matches losses/colclip.py's sharded branch bit-for-bit when the banks are
    the true per-rank blocks (see tests/test_pod_shape.py); bench.py feeds
    rolled stand-ins with identical shapes/graph structure instead.
    """
    b = image_features.shape[0]
    logits_per_image = logit_scale * _matmul_t(image_features, all_text)
    logits_per_text = logit_scale * _matmul_t(text_features, all_image)
    s_text = _blockwise_rows(
        token_text_features, tok_image_blocks, transpose=False,
        maxsim_impl=maxsim_impl, mask_mode=mask_mode, window_mode=window_mode)
    s_image = _blockwise_rows(
        token_image_features, tok_text_blocks, transpose=True,
        maxsim_impl=maxsim_impl, mask_mode=mask_mode, window_mode=window_mode)
    logits_per_text_token = logit_scale * s_text
    logits_per_image_token = logit_scale * s_image

    labels = jnp.arange(b) + label_offset
    token_labels = jnp.arange(b)  # capped layout: slot-0 diagonal
    global_contrastive_loss = (
        cross_entropy_with_integer_labels(logits_per_image, labels)
        + cross_entropy_with_integer_labels(logits_per_text, labels)
    ) / 2
    token_contrastive_loss = (
        cross_entropy_with_integer_labels(logits_per_image_token, token_labels)
        + cross_entropy_with_integer_labels(logits_per_text_token, token_labels)
    ) / 2
    total = alpha * global_contrastive_loss + (1 - alpha) * token_contrastive_loss
    if output_dict:
        return {
            "global_contrastive_loss": global_contrastive_loss,
            "token_contrastive_loss": token_contrastive_loss,
            "total_loss": total,
        }
    return total


def make_pod_banks(out: dict, *, neighborhood: int, pod_devices: int,
                   gather_with_grad: bool = True):
    """Stand-in collective banks from the local model outputs.

    Pooled banks are M rolled copies (slot 0 unrolled = the positives), token
    windows are K rolled blocks. Rolls are distinct row permutations of a
    param-dependent tensor: the compiler cannot CSE the per-block MaxSims or
    fold the bank matmul into a tiled local one, and with gather_with_grad
    the backward computes d(bank) for the full window exactly like the
    differentiable ring does (the grads then collapse into d(local) through
    the rolls — the stand-in for the reversed-ring reduce).
    """
    k = neighborhood or pod_devices
    img, txt = out["image_features"], out["text_features"]
    tok_img, tok_txt = out["token_image_features"], out["token_text_features"]

    def rolls(x, n):
        return [x if s == 0 else jnp.roll(x, s, axis=0) for s in range(n)]

    banks = {
        "all_image": jnp.concatenate(rolls(img, pod_devices), axis=0),
        "all_text": jnp.concatenate(rolls(txt, pod_devices), axis=0),
        "tok_image_blocks": jnp.stack(rolls(tok_img, k)),
        "tok_text_blocks": jnp.stack(rolls(tok_txt, k)),
    }
    if not gather_with_grad:
        # reference local-loss default: the gathered side carries no gradient
        banks = jax.tree.map(jax.lax.stop_gradient, banks)
    return banks


def make_pod_shape_step(
    model,
    tx,
    cfg: TrainStepConfig,
    *,
    pod_devices: int,
    window_mode: str = "scan",
    donate: bool = True,
):
    """Jitted single-chip step fn(state, images, texts) -> (state, metrics)
    whose compute per step is one pod chip's share of the M-chip
    local_loss+ring recipe (see module docstring). cfg.token_neighborhood=0
    means the full M-block token ring (the reference's own 2048-global
    envelope when M*b == 2048, /root/reference/src/colxlip.sh:8-10)."""
    forward = build_forward(model, cfg, None)

    def loss_fn(params, images, texts):
        out = forward(params, images, texts)
        banks = make_pod_banks(
            out, neighborhood=cfg.token_neighborhood,
            pod_devices=pod_devices, gather_with_grad=cfg.gather_with_grad)
        losses = pod_shape_loss(
            out["image_features"], out["text_features"],
            out["token_image_features"], out["token_text_features"],
            out["logit_scale"], alpha=cfg.alpha,
            maxsim_impl=cfg.maxsim_impl, mask_mode=cfg.mask_mode,
            window_mode=window_mode,
            **banks,
        )
        return losses["total_loss"], (losses, out["logit_scale"])

    def step(state: TrainState, images, texts):
        (_, (losses, logit_scale)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, images, texts)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        if cfg.clamp_logit_scale:
            new_params = _clamp_logit_scale(new_params)
        metrics = dict(losses)
        metrics["logit_scale"] = logit_scale
        metrics["grad_norm"] = optax_global_norm(grads)
        return TrainState(state.step + 1, new_params, new_opt_state), metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())

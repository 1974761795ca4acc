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

import jax

from ..ops.maxsim import maxsim
from ..parallel.collectives import gather_features, gather_pair
from .clip import contrastive_labels, cross_entropy_with_integer_labels, _matmul_t


from ..parallel.collectives import ring_shift as _ring_shift


def _ring_maxsim_rows(
    token_q, token_k_local, axis_name, *, transpose: bool,
    maxsim_impl: str, mask_mode: str, gather_with_grad: bool = True,
    text_mask=None, ring_steps: Optional[int] = None,
):
    """[b_q, N_global] MaxSim rows computed blockwise over a ppermute ring.

    TPU-native generalization of the reference's SigLIP ring negatives
    (loss.py:382-467) to the token loss: instead of all-gathering every
    device's token tensors (O(N * L * D) HBM — impossible at 32k global
    batch), key blocks rotate around the ICI ring and each device only ever
    holds one remote block. AD through ppermute reverses the ring, so the
    gradient is the FULL differentiable-gather gradient at O(b) memory.

    transpose=False: rows = maxsim(local queries, rotating key blocks).
    transpose=True : rows = maxsim(rotating query blocks, local keys).T —
    used for the image-row direction where the local tensor is the key side.

    The ring is a ``lax.scan`` over ring steps, not an unrolled Python loop:
    at pod scale (64+ devices) unrolling would inline one MaxSim subgraph
    per step per direction into the HLO and blow up compile time; the scan
    compiles ONE block body regardless of ring size.

    ``ring_steps`` < axis size caps the rotation: the rows then cover only a
    K-device NEIGHBORHOOD of key blocks — the local block at column slot 0,
    ring-neighbor s's block at slot s — instead of the full global batch.
    This is the FLOP mitigation for the token loss's O(b x N_global) MaxSim
    at pod scale (docs/BENCH.md round-4 arithmetic: at 32k global the full
    token loss is ~1.5 TF per image — 12x the towers); with the cap the
    token CE sees K*b negatives while the cheap pooled InfoNCE keeps the
    full global batch. Labels for the capped layout are the slot-0 diagonal.
    """
    n = jax.lax.axis_size(axis_name)
    rank = jax.lax.axis_index(axis_name)
    steps = n if ring_steps is None else min(ring_steps, n)
    capped = steps < n
    # capped transpose rotates the OPPOSITE way so both CE directions score
    # exactly the same pair set {(t_r, i_{r-s}) : s < K}: text rows on rank r
    # pull image blocks from ranks r-s; image rows on rank q pull text blocks
    # from ranks q+s — symmetric coverage with the positive at slot 0.
    shift = -1 if (capped and transpose) else 1
    b_rows = token_q.shape[0] if not transpose else token_k_local.shape[0]
    b_block = token_k_local.shape[0] if not transpose else token_q.shape[0]
    rotating = token_k_local if not transpose else token_q
    local = token_q if not transpose else token_k_local
    rot_mask = text_mask if transpose else None
    if not gather_with_grad:
        # reference local-loss default (loss.py:80-90 without splice): the
        # gathered side carries NO gradient, including this device's own
        # block appearing as columns/rotating queries
        rotating = jax.lax.stop_gradient(rotating)

    def compute_block(rotating, rot_mask, cols, s):
        # capped layout: slot s; full ring: the owner's global column block
        slot = s if capped else (rank - s * shift) % n
        if not transpose:
            block = maxsim(local, rotating, mask_mode=mask_mode,
                           text_mask=text_mask, impl=maxsim_impl)
        else:
            block = maxsim(rotating, local, mask_mode=mask_mode,
                           text_mask=rot_mask, impl=maxsim_impl).T
        return jax.lax.dynamic_update_slice(
            cols, block.astype(cols.dtype), (0, slot * b_block))

    def body(carry, s):
        # shift FIRST, then compute: the s=0 (local) block is handled outside
        # the scan, so only steps-1 ppermutes run — the old compute-then-shift
        # body did n, wasting one full rotating-block ICI exchange per
        # direction per step whose result was discarded.
        rotating, rot_mask, cols = carry
        rotating = _ring_shift(rotating, axis_name, shift)
        if rot_mask is not None:
            rot_mask = _ring_shift(rot_mask, axis_name, shift)
        cols = compute_block(rotating, rot_mask, cols, s)
        return (rotating, rot_mask, cols), None

    cols0 = jnp.zeros((b_rows, steps * b_block), jnp.float32)
    # the zeros init is unvarying over the mesh axis while the body writes
    # varying blocks into it — pcast aligns the scan carry's manual-axes type
    cols0 = jax.lax.pcast(cols0, (axis_name,), to="varying")
    cols0 = compute_block(rotating, rot_mask, cols0, 0)
    if steps == 1:
        return cols0
    (_, _, cols), _ = jax.lax.scan(
        body, (rotating, rot_mask, cols0), jnp.arange(1, steps))
    return cols


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
    token_dist: str = "gather",          # 'gather' | 'ring' (local_loss only)
    token_neighborhood: int = 0,         # >0: token CE negatives from a
                                         # K-device ring neighborhood (FLOP
                                         # cap for pod-scale global batches;
                                         # requires token_dist='ring')
    text_mask: Optional[jnp.ndarray] = None,   # [b, Lt], required for 'valid'
    output_dict: bool = True,
):
    gkw = dict(axis_name=axis_name, gather_with_grad=gather_with_grad, local_loss=local_loss)
    if token_neighborhood and token_dist != "ring":
        raise ValueError(
            "token_neighborhood requires token_dist='ring' (the cap is a "
            "bounded ring rotation; gather mode always pays the full "
            "global-batch MaxSim)")
    token_labels = None

    if axis_name is not None and local_loss:
        # Sharded-logits form (the reference's missing local_loss branch).
        all_image, all_text = gather_pair(image_features, text_features, **gkw)

        logits_per_image = logit_scale * _matmul_t(image_features, all_text)
        logits_per_text = logit_scale * _matmul_t(text_features, all_image)
        if token_dist == "ring":
            # blockwise ring: never gathers the token tensors
            steps = token_neighborhood or None
            s_text = _ring_maxsim_rows(
                token_text_features, token_image_features, axis_name,
                transpose=False, maxsim_impl=maxsim_impl, mask_mode=mask_mode,
                gather_with_grad=gather_with_grad, text_mask=text_mask,
                ring_steps=steps,
            )
            s_image = _ring_maxsim_rows(
                token_text_features, token_image_features, axis_name,
                transpose=True, maxsim_impl=maxsim_impl, mask_mode=mask_mode,
                gather_with_grad=gather_with_grad, text_mask=text_mask,
                ring_steps=steps,
            )
            if steps is not None and s_text.shape[1] < logits_per_text.shape[1]:
                # capped layout: the positive sits on the slot-0 diagonal
                token_labels = jnp.arange(s_text.shape[0])
        else:
            all_tok_image = gather_features(token_image_features, **gkw)
            all_tok_text = gather_features(token_text_features, **gkw)
            all_text_mask = (gather_features(text_mask, **gkw)
                             if text_mask is not None else None)
            # S[m, k] rows for local texts over all images:
            s_text = maxsim(token_text_features, all_tok_image, mask_mode=mask_mode,
                            text_mask=text_mask, impl=maxsim_impl)
            # columns for local images over all texts, transposed into rows:
            s_image = maxsim(all_tok_text, token_image_features, mask_mode=mask_mode,
                             text_mask=all_text_mask, impl=maxsim_impl).T
        logits_per_text_token = logit_scale * s_text
        logits_per_image_token = logit_scale * s_image
        num_logits = logits_per_image.shape[0]
    elif axis_name is not None:
        all_image, all_text = gather_pair(image_features, text_features, **gkw)
        all_tok_image = gather_features(token_image_features, **gkw)
        all_tok_text = gather_features(token_text_features, **gkw)
        all_text_mask = (gather_features(text_mask, **gkw)
                         if text_mask is not None else None)
        logits_per_image = logit_scale * _matmul_t(all_image, all_text)
        logits_per_text = logits_per_image.T
        s = maxsim(all_tok_text, all_tok_image, mask_mode=mask_mode,
                   text_mask=all_text_mask, impl=maxsim_impl)
        logits_per_text_token = logit_scale * s
        logits_per_image_token = logits_per_text_token.T
        num_logits = logits_per_image.shape[0]
    else:
        logits_per_image = logit_scale * _matmul_t(image_features, text_features)
        logits_per_text = logits_per_image.T
        s = maxsim(token_text_features, token_image_features, mask_mode=mask_mode,
                   text_mask=text_mask, impl=maxsim_impl)
        logits_per_text_token = logit_scale * s
        logits_per_image_token = logits_per_text_token.T
        num_logits = logits_per_image.shape[0]

    if logit_bias is not None:
        logits_per_image = logits_per_image + logit_bias
        logits_per_text = logits_per_text + logit_bias

    labels = contrastive_labels(num_logits, axis_name=axis_name, local_loss=local_loss)
    if token_labels is None:
        token_labels = labels
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

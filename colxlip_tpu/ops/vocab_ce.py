"""Streaming vocabulary cross-entropy for the CoCa caption head.

Counterpart of the reference CoCaLoss caption term
(/root/reference/src/colxlip/loss.py:298-340: ``F.cross_entropy(logits,
labels, ignore_index=pad_id)`` over [B, L, V] logits) — re-designed for TPU
memory: the dense path materializes the [B, L, V] logit tensor three times
(bf16 head output, fp32 cast, fp32 softmax backward), which at CoCa
ViT-B-32 batch 256 is 256*75*49408 * (2+4+4) bytes ≈ 9.5 GB and OOMs the
16 GB v5e chip (measured — docs/BENCH.md round 3). This path instead fuses
the head matmul INTO the loss with a lax.scan over row chunks:

  forward : per chunk of R = B*(L-1) rows, logits_c = h_c @ W (MXU bf16,
            fp32 accumulation), fp32 logsumexp, gather the true logit,
            masked-sum into a scalar carry. Peak extra memory is ONE
            [C, V] fp32 chunk (~200 MB at C=1024).
  backward: recompute each chunk's softmax (same streaming pattern as the
            MaxSim custom VJP, ops/maxsim.py), subtract the one-hot, scale
            by the masked-mean cotangent, and emit dh chunks (stacked scan
            output) while accumulating dW in a fp32 [D, V] carry (~100 MB).

Same masked-mean semantics as losses/coca.caption_cross_entropy: positions
with label == ignore_index contribute neither to the sum nor the count.
Selected via TrainStepConfig.ce_impl == 'fused' (the knob that already
routes the clip InfoNCE through the streaming fused CE).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _pick_chunk(rows: int, target: int = 1024) -> int:
    """Largest divisor of ``rows`` ≤ target (rows is padded to a multiple of
    ``target`` by the caller, so this normally just returns ``target``)."""
    c = min(target, rows)
    while rows % c:
        c -= 1
    return c


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def streaming_vocab_ce(hidden, kernel, labels, ignore_index: int = 0,
                       chunk: int = 1024):
    """Masked-mean CE of ``hidden @ kernel`` against ``labels``.

    hidden: [B, L, D] (any float dtype; matmul runs in its dtype with fp32
    accumulation), kernel: [D, V], labels: [B, L] int32. Returns a fp32
    scalar. Never materializes the [B, L, V] logits.
    """
    loss, _ = _forward(hidden, kernel, labels, ignore_index, chunk)
    return loss


def _flatten_pad(hidden, labels, ignore_index, chunk):
    b, l, d = hidden.shape
    r = b * l
    h2 = hidden.reshape(r, d)
    lab = labels.reshape(r)
    pad = (-r) % chunk
    if pad:
        h2 = jnp.concatenate([h2, jnp.zeros((pad, d), h2.dtype)], axis=0)
        lab = jnp.concatenate(
            [lab, jnp.full((pad,), ignore_index, lab.dtype)], axis=0)
    return h2, lab, r, pad


def _forward(hidden, kernel, labels, ignore_index, chunk):
    h2, lab, r, _ = _flatten_pad(hidden, labels, ignore_index, chunk)
    c = _pick_chunk(h2.shape[0], chunk)
    n = h2.shape[0] // c
    # cast the (fp32-stored) kernel to the activation dtype so the [C, V]
    # matmul runs on the bf16 MXU path — and so the backward's recomputed
    # softmax (which uses the same cast) is the derivative of THIS loss
    k_cast = kernel.astype(hidden.dtype)
    valid_count = jnp.maximum(
        jnp.sum((lab != ignore_index).astype(jnp.float32)), 1.0)

    def body(acc, inp):
        h_c, lab_c = inp
        logits = jnp.dot(h_c, k_cast, preferred_element_type=jnp.float32)
        lse = jax.scipy.special.logsumexp(logits, axis=-1)
        true = jnp.take_along_axis(logits, lab_c[:, None], axis=-1)[:, 0]
        valid = (lab_c != ignore_index).astype(jnp.float32)
        return acc + jnp.sum((lse - true) * valid), None

    total, _ = jax.lax.scan(
        body, jnp.zeros((), jnp.float32),
        (h2.reshape(n, c, -1), lab.reshape(n, c)))
    return total / valid_count, valid_count


def _vjp_fwd(hidden, kernel, labels, ignore_index, chunk):
    loss, count = _forward(hidden, kernel, labels, ignore_index, chunk)
    return loss, (hidden, kernel, labels, count)


def _vjp_bwd(ignore_index, chunk, res, g):
    hidden, kernel, labels, count = res
    h2, lab, r, pad = _flatten_pad(hidden, labels, ignore_index, chunk)
    c = _pick_chunk(h2.shape[0], chunk)
    n = h2.shape[0] // c
    d, v = kernel.shape
    k_cast = kernel.astype(hidden.dtype)
    row_scale = g.astype(jnp.float32) / count

    def body(dw_acc, inp):
        h_c, lab_c = inp
        logits = jnp.dot(h_c, k_cast, preferred_element_type=jnp.float32)
        p = jax.nn.softmax(logits, axis=-1)
        onehot = jax.nn.one_hot(lab_c, v, dtype=jnp.float32)
        valid = (lab_c != ignore_index).astype(jnp.float32)
        dl = (p - onehot) * (valid * row_scale)[:, None]
        dl_cast = dl.astype(hidden.dtype)
        dh_c = jnp.dot(dl_cast, k_cast.T,
                       preferred_element_type=jnp.float32).astype(hidden.dtype)
        dw_acc = dw_acc + jnp.dot(h_c.T, dl_cast,
                                  preferred_element_type=jnp.float32)
        return dw_acc, dh_c

    dw, dh = jax.lax.scan(
        body, jnp.zeros((d, v), jnp.float32),
        (h2.reshape(n, c, -1), lab.reshape(n, c)))
    dh = dh.reshape(n * c, d)[:r].reshape(hidden.shape)
    dlab = jnp.zeros(labels.shape, dtype=jax.dtypes.float0)
    return dh, dw.astype(kernel.dtype), dlab


streaming_vocab_ce.defvjp(_vjp_fwd, _vjp_bwd)

"""Fused contrastive cross-entropy: streaming matmul + online logsumexp.

The north-star kernel for the large-batch CLIP loss (BASELINE.json): at 32k
global batch the [N, N] logit matrix is 4 GB fp32 — materializing it (as the
reference does, loss.py:148-152) caps the batch. This kernel computes

    loss_i = logsumexp_j(scale * <a_i, b_j>) - scale * <a_i, b_{label_i}>

flash-attention-style: row tiles of A stay VMEM-resident while column tiles
of B stream through one MXU matmul each; the running (max, sumexp) pair and
the true-label logit live in VMEM scratch that persists across the column
grid. Memory is O(N*D + BM*BN), FLOPs identical to the dense product.

Backward recomputes the tiles (no residual beyond per-row LSE):
    dz_ij = (softmax_ij - onehot_ij) * g_i
    dA    = scale * dz @ B          (row-tile accumulation kernel)
    dB    = scale * dz^T @ A        (column-tile accumulation kernel)
    dscale = sum_ij dz_ij * <a_i, b_j>  (accumulated per row tile)

Used by the symmetric InfoNCE by calling once per direction (the two
directions share FLOPs but not memory, so two streaming passes beat one
materialized matrix at any N where this kernel matters).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30


def _round_up(x, m):
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fwd_kernel(a_ref, b_ref, labels_ref, scale_ref, loss_ref, lse_ref,
                m_scr, s_scr, zt_scr, *, bn, n_valid):
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    scale = scale_ref[0, 0]

    @pl.when(j == 0)
    def _():
        m_scr[...] = jnp.full_like(m_scr, _NEG)
        s_scr[...] = jnp.zeros_like(s_scr)
        zt_scr[...] = jnp.zeros_like(zt_scr)

    logits = scale * jax.lax.dot_general(
        a_ref[...], b_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [BM, BN]
    col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1) + j * bn
    logits = jnp.where(col < n_valid, logits, _NEG)

    m_old = m_scr[...]
    m_new = jnp.maximum(m_old, jnp.max(logits, axis=1, keepdims=True))
    s_scr[...] = s_scr[...] * jnp.exp(m_old - m_new) + jnp.sum(
        jnp.exp(logits - m_new), axis=1, keepdims=True
    )
    m_scr[...] = m_new

    is_label = col == labels_ref[...]  # labels block [BM, 1]
    zt_scr[...] += jnp.sum(jnp.where(is_label, logits, 0.0), axis=1, keepdims=True)

    @pl.when(j == nj - 1)
    def _():
        lse = m_scr[...] + jnp.log(s_scr[...])
        lse_ref[...] = lse
        loss_ref[...] = lse - zt_scr[...]


def _fwd_call(a, b, labels, scale, *, bm, bn, n_valid, interpret):
    m_pad, d = a.shape
    n_pad, _ = b.shape
    grid = (m_pad // bm, n_pad // bn)
    kernel = functools.partial(_fwd_kernel, bn=bn, n_valid=n_valid)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((m_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((m_pad, 1), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, d), lambda i, j: (i, 0)),
            pl.BlockSpec((bn, d), lambda i, j: (j, 0)),
            pl.BlockSpec((bm, 1), lambda i, j: (i, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((bm, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((bm, 1), lambda i, j: (i, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((bm, 1), jnp.float32),
            pltpu.VMEM((bm, 1), jnp.float32),
            pltpu.VMEM((bm, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * n_pad * d,
            bytes_accessed=(a.size + grid[0] * b.size) * a.dtype.itemsize,
            transcendentals=m_pad * n_pad,
        ),
        interpret=interpret,
    )(a, b, labels, scale)


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

def _bwd_da_kernel(a_ref, b_ref, labels_ref, scale_ref, lse_ref, g_ref,
                   da_ref, dscale_ref, *, bn, n_valid):
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    scale = scale_ref[0, 0]

    @pl.when(j == 0)
    def _():
        da_ref[...] = jnp.zeros_like(da_ref)
        dscale_ref[...] = jnp.zeros_like(dscale_ref)

    raw = jax.lax.dot_general(
        a_ref[...], b_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    col = jax.lax.broadcasted_iota(jnp.int32, raw.shape, 1) + j * bn
    z = jnp.where(col < n_valid, scale * raw, _NEG)
    p = jnp.exp(z - lse_ref[...])
    onehot = (col == labels_ref[...]).astype(jnp.float32)
    dz = (p - onehot) * g_ref[...]
    dz = jnp.where(col < n_valid, dz, 0.0)
    da_ref[...] += scale * jax.lax.dot_general(
        dz, b_ref[...].astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dscale_ref[...] += jnp.sum(dz * raw, axis=1, keepdims=True)


def _bwd_db_kernel(a_ref, b_ref, labels_ref, scale_ref, lse_ref, g_ref,
                   db_ref, *, bn, n_valid):
    i = pl.program_id(1)
    j = pl.program_id(0)
    scale = scale_ref[0, 0]

    @pl.when(i == 0)
    def _():
        db_ref[...] = jnp.zeros_like(db_ref)

    raw = jax.lax.dot_general(
        a_ref[...], b_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [BM, BN]
    col = jax.lax.broadcasted_iota(jnp.int32, raw.shape, 1) + j * bn
    z = jnp.where(col < n_valid, scale * raw, _NEG)
    p = jnp.exp(z - lse_ref[...])
    onehot = (col == labels_ref[...]).astype(jnp.float32)
    dz = (p - onehot) * g_ref[...]
    dz = jnp.where(col < n_valid, dz, 0.0)
    db_ref[...] += scale * jax.lax.dot_general(
        dz, a_ref[...].astype(jnp.float32),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [BN, D]


def _bwd_call(a, b, labels, scale, lse, g, *, bm, bn, n_valid, interpret):
    m_pad, d = a.shape
    n_pad, _ = b.shape

    da, dscale_rows = pl.pallas_call(
        functools.partial(_bwd_da_kernel, bn=bn, n_valid=n_valid),
        out_shape=(
            jax.ShapeDtypeStruct((m_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((m_pad, 1), jnp.float32),
        ),
        grid=(m_pad // bm, n_pad // bn),
        in_specs=[
            pl.BlockSpec((bm, d), lambda i, j: (i, 0)),
            pl.BlockSpec((bn, d), lambda i, j: (j, 0)),
            pl.BlockSpec((bm, 1), lambda i, j: (i, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((bm, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((bm, 1), lambda i, j: (i, 0)),
        ],
        out_specs=(
            pl.BlockSpec((bm, d), lambda i, j: (i, 0)),
            pl.BlockSpec((bm, 1), lambda i, j: (i, 0)),
        ),
        interpret=interpret,
    )(a, b, labels, scale, lse, g)

    db = pl.pallas_call(
        functools.partial(_bwd_db_kernel, bn=bn, n_valid=n_valid),
        out_shape=jax.ShapeDtypeStruct((n_pad, d), jnp.float32),
        grid=(n_pad // bn, m_pad // bm),
        in_specs=[
            pl.BlockSpec((bm, d), lambda j, i: (i, 0)),
            pl.BlockSpec((bn, d), lambda j, i: (j, 0)),
            pl.BlockSpec((bm, 1), lambda j, i: (i, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((bm, 1), lambda j, i: (i, 0)),
            pl.BlockSpec((bm, 1), lambda j, i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((bn, d), lambda j, i: (j, 0)),
        interpret=interpret,
    )(a, b, labels, scale, lse, g)

    return da, db, dscale_rows


# ---------------------------------------------------------------------------
# public op
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _fused_ce(a, b, labels_scale, n_valid, bm, bn, interpret):
    out, _ = _fused_ce_fwd(a, b, labels_scale, n_valid, bm, bn, interpret)
    return out


def _fused_ce_fwd(a, b, labels_scale, n_valid, bm, bn, interpret):
    labels, scale = labels_scale
    loss_rows, lse = _fwd_call(
        a, b, labels, scale.reshape(1, 1), bm=bm, bn=bn, n_valid=n_valid,
        interpret=interpret,
    )
    return loss_rows, (a, b, labels, scale, lse)


def _fused_ce_bwd(n_valid, bm, bn, interpret, res, g):
    a, b, labels, scale, lse = res
    da, db, dscale_rows = _bwd_call(
        a, b, labels, scale.reshape(1, 1), lse, g.astype(jnp.float32),
        bm=bm, bn=bn, n_valid=n_valid, interpret=interpret,
    )
    dscale = jnp.sum(dscale_rows)
    return da.astype(a.dtype), db.astype(b.dtype), (None, dscale.astype(scale.dtype))


_fused_ce.defvjp(_fused_ce_fwd, _fused_ce_bwd)


def fused_contrastive_ce(
    a: jnp.ndarray,
    b: jnp.ndarray,
    labels: jnp.ndarray,
    logit_scale: jnp.ndarray,
    *,
    block_m: int = 256,
    block_n: int = 512,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Mean over rows of CE(scale * a @ b.T, labels) without materializing it.

    a: [M, D], b: [N, D], labels: [M] int32 column indices. Differentiable in
    a, b, and logit_scale.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    m, d = a.shape
    n = b.shape[0]
    bm = min(block_m, _round_up(m, 8))
    bn = min(block_n, _round_up(n, 128))
    m_pad = _round_up(m, bm)
    n_pad = _round_up(n, bn)
    a_p = jnp.pad(a, ((0, m_pad - m), (0, 0)))
    b_p = jnp.pad(b, ((0, n_pad - n), (0, 0)))
    labels_p = jnp.pad(labels.astype(jnp.int32), (0, m_pad - m)).reshape(m_pad, 1)
    scale = jnp.asarray(logit_scale, jnp.float32)
    loss_rows = _fused_ce(a_p, b_p, (labels_p, scale), n, bm, bn, interpret)
    return jnp.mean(loss_rows[:m, 0])

"""Blocked Pallas TPU kernel for ColBERT MaxSim similarity + custom VJP.

The memory-cliff op of the reference (loss.py:34 materializes [M,K,Lt,Li];
SURVEY.md §7.3 calls this the core engineering risk). This kernel never
materializes more than one [BM*Lt, Li_pad] similarity tile in VMEM:

  forward   S[m,k] = masked-mean_n max_q <T[m,n,:], I[k,q,:]>
    grid (M/BM, K/BK), k fastest: the text tile stays VMEM-resident while
    image tiles stream; each inner step is one MXU matmul
    [BM*Lt, D] @ [D, Li_pad] with fp32 accumulation, followed by a VPU
    max/mean reduction. Tiles are independent — blocking is exact.

  backward  two kernels (flash-attention-style recompute; no residuals
    beyond the inputs):
      dT: grid (M/BM, K/BK) k-fastest, accumulates over k into the dT block;
          routes dS[m,k]*w/cnt through the argmax image token:
          dT += (P * scale) @ I   with P = one_hot(argmax_q sim)
      dI: grid (K/BK, M/BM) i-fastest, accumulates over i into the dI block:
          dI[q] += sum_mn P[mn,q] * scale[mn] * T[mn,:]

TPU lane constraint: Mosaic requires the last block dim to be a multiple of
128 (or the full array). S is therefore blocked (BM, 128) and each group of
``r = 128 // BK`` consecutive k-programs masked-accumulates its BK columns
into the group block (the block stays VMEM-resident across the group since
its index map is constant within it). The same grouping reads dS in the
backward kernels.

mask_mode semantics identical to ops.maxsim (nonzero / plain / valid); the
nonzero indicator and counts are recomputed in the backward, with gradients
treating the indicator as constant (measure-zero events ignored), matching
torch autograd through ``(x != 0).float()``.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-8
_NEG = -1e30
_LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pad_axis0(x, target):
    pad = target - x.shape[0]
    if pad == 0:
        return x
    return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))


def _weights(max_sim, mask_tile, mask_mode):
    """Per-(row) weights for the masked mean; max_sim [BM, Lt] fp32."""
    if mask_mode == "nonzero":
        return (max_sim != 0).astype(jnp.float32)
    if mask_mode == "plain":
        return jnp.ones_like(max_sim)
    return mask_tile.astype(jnp.float32)  # 'valid'


def _sim_tile(t_flat, i_k, li):
    """[BM*Lt, D] x [Li_pad, D] -> fp32 [BM*Lt, Li_pad] with padded-q bias."""
    sim = jax.lax.dot_general(
        t_flat, i_k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    li_pad = i_k.shape[0]
    if li_pad != li:
        q_ids = jax.lax.broadcasted_iota(jnp.int32, sim.shape, 1)
        sim = jnp.where(q_ids < li, sim, _NEG)
    return sim


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fwd_kernel(t_ref, i_ref, mask_ref, out_ref, *, bm, bk, lt, li, mask_mode, r):
    k = pl.program_id(1)
    off = (k % r) * bk
    t = t_ref[...]
    t_flat = t.reshape(bm * lt, t.shape[-1])
    mask_tile = mask_ref[...] if mask_ref is not None else None
    lane = jax.lax.broadcasted_iota(jnp.int32, (bm, _LANE), 1)

    def body(j, acc):
        sim = _sim_tile(t_flat, i_ref[j], li)
        m = jnp.max(sim, axis=1).reshape(bm, lt)
        w = _weights(m, mask_tile, mask_mode)
        s = jnp.sum(m * w, axis=1) / (jnp.sum(w, axis=1) + _EPS)  # [BM]
        return acc + jnp.where(lane == off + j, s[:, None], 0.0)

    acc = jax.lax.fori_loop(0, bk, body, jnp.zeros((bm, _LANE), jnp.float32))

    @pl.when(k % r == 0)
    def _():
        out_ref[...] = acc

    @pl.when(k % r != 0)
    def _():
        out_ref[...] += acc


def _fwd_call(t, i, mask, *, bm, bk, li, mask_mode, interpret):
    m_pad, lt, d = t.shape
    k_pad, li_pad, _ = i.shape
    r = _LANE // bk
    grid = (m_pad // bm, k_pad // bk)
    in_specs = [
        pl.BlockSpec((bm, lt, d), lambda gi, gk: (gi, 0, 0)),
        pl.BlockSpec((bk, li_pad, d), lambda gi, gk: (gk, 0, 0)),
    ]
    args = [t, i]
    if mask is not None:
        in_specs.append(pl.BlockSpec((bm, lt), lambda gi, gk: (gi, 0)))
        args.append(mask)
        kernel = functools.partial(
            _fwd_kernel, bm=bm, bk=bk, lt=lt, li=li, mask_mode=mask_mode, r=r
        )
    else:
        kernel = functools.partial(
            lambda t_ref, i_ref, out_ref, **kw: _fwd_kernel(
                t_ref, i_ref, None, out_ref, **kw
            ),
            bm=bm, bk=bk, lt=lt, li=li, mask_mode=mask_mode, r=r,
        )
    flops = 2 * m_pad * lt * k_pad * li_pad * d
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m_pad, k_pad), jnp.float32),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, _LANE), lambda gi, gk: (gi, gk // r)),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=t.size * t.dtype.itemsize
            + grid[0] * i.size * i.dtype.itemsize + m_pad * k_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

def _g_col(g_block, lane, col):
    """Extract column ``col`` (traced) of a [BM, 128] block as [BM]."""
    return jnp.sum(jnp.where(lane == col, g_block, 0.0), axis=1)


def _scale_tile(sim, mask_tile, g_col, bm, lt, mask_mode):
    """Per-element routing scale [BM*Lt, 1] for dS column g_col [BM]."""
    m = jnp.max(sim, axis=1).reshape(bm, lt)
    w = _weights(m, mask_tile, mask_mode)
    cnt = jnp.sum(w, axis=1) + _EPS                     # [BM]
    scale = w * (g_col / cnt)[:, None]                  # [BM, Lt]
    return scale.reshape(bm * lt, 1)


def _argmax_onehot(sim):
    amax = jnp.argmax(sim, axis=1)
    q_ids = jax.lax.broadcasted_iota(jnp.int32, sim.shape, 1)
    return (q_ids == amax[:, None]).astype(jnp.float32)


def _bwd_dt_kernel(t_ref, i_ref, g_ref, mask_ref, out_ref, *,
                   bm, bk, lt, li, mask_mode, r):
    k = pl.program_id(1)
    off = (k % r) * bk
    t = t_ref[...]
    d = t.shape[-1]
    t_flat = t.reshape(bm * lt, d)
    mask_tile = mask_ref[...] if mask_ref is not None else None
    g = g_ref[...]  # [BM, 128]
    lane = jax.lax.broadcasted_iota(jnp.int32, (bm, _LANE), 1)

    def body(j, acc):
        i_k = i_ref[j]
        sim = _sim_tile(t_flat, i_k, li)
        p = _argmax_onehot(sim)
        scale = _scale_tile(sim, mask_tile, _g_col(g, lane, off + j),
                            bm, lt, mask_mode)
        contrib = jax.lax.dot_general(
            p * scale, i_k.astype(jnp.float32),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [BM*Lt, D]
        return acc + contrib

    acc = jax.lax.fori_loop(
        0, bk, body, jnp.zeros((bm * lt, t.shape[-1]), jnp.float32)
    )

    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[...] += acc.reshape(bm, lt, d)


def _bwd_di_kernel(t_ref, i_ref, g_ref, mask_ref, out_ref, *,
                   bm, bk, lt, li, mask_mode, r):
    k = pl.program_id(0)
    off = (k % r) * bk
    t = t_ref[...]
    d = t.shape[-1]
    # keep sim in the input dtype (matches fwd/dT: bf16 x bf16 MXU path);
    # cast only the routing matmul's second operand
    t_flat = t.reshape(bm * lt, d)
    mask_tile = mask_ref[...] if mask_ref is not None else None
    g = g_ref[...]  # [BM, 128]
    lane = jax.lax.broadcasted_iota(jnp.int32, (bm, _LANE), 1)

    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    def body(j, _):
        i_k = i_ref[j]
        sim = _sim_tile(t_flat, i_k, li)
        p = _argmax_onehot(sim)
        scale = _scale_tile(sim, mask_tile, _g_col(g, lane, off + j),
                            bm, lt, mask_mode)
        contrib = jax.lax.dot_general(
            p * scale, t_flat.astype(jnp.float32),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [Li_pad, D]
        out_ref[j] += contrib
        return 0

    jax.lax.fori_loop(0, bk, body, 0)


def _bwd_call(t, i, mask, g, *, bm, bk, li, mask_mode, interpret):
    m_pad, lt, d = t.shape
    k_pad, li_pad, _ = i.shape
    r = _LANE // bk

    def make(kernel_fn, grid, out_shape, out_spec, transposed_g):
        # index maps: plain order (i-major, k-fast) vs transposed
        if not transposed_g:
            t_map = lambda gi, gk: (gi, 0, 0)
            i_map = lambda gi, gk: (gk, 0, 0)
            g_map = lambda gi, gk: (gi, gk // r)
            m_map = lambda gi, gk: (gi, 0)
        else:
            t_map = lambda gk, gi: (gi, 0, 0)
            i_map = lambda gk, gi: (gk, 0, 0)
            g_map = lambda gk, gi: (gi, gk // r)
            m_map = lambda gk, gi: (gi, 0)
        in_specs = [
            pl.BlockSpec((bm, lt, d), t_map),
            pl.BlockSpec((bk, li_pad, d), i_map),
            pl.BlockSpec((bm, _LANE), g_map),
        ]
        args = [t, i, g]
        if mask is not None:
            in_specs.append(pl.BlockSpec((bm, lt), m_map))
            args.append(mask)
            body = functools.partial(
                kernel_fn, bm=bm, bk=bk, lt=lt, li=li, mask_mode=mask_mode, r=r
            )
        else:
            body = functools.partial(
                lambda t_ref, i_ref, g_ref, out_ref, **kw: kernel_fn(
                    t_ref, i_ref, g_ref, None, out_ref, **kw
                ),
                bm=bm, bk=bk, lt=lt, li=li, mask_mode=mask_mode, r=r,
            )
        return pl.pallas_call(
            body,
            out_shape=out_shape,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_spec,
            interpret=interpret,
        )(*args)

    dt = make(
        _bwd_dt_kernel,
        (m_pad // bm, k_pad // bk),
        jax.ShapeDtypeStruct((m_pad, lt, d), jnp.float32),
        pl.BlockSpec((bm, lt, d), lambda gi, gk: (gi, 0, 0)),
        transposed_g=False,
    )
    di = make(
        _bwd_di_kernel,
        (k_pad // bk, m_pad // bm),
        jax.ShapeDtypeStruct((k_pad, li_pad, d), jnp.float32),
        pl.BlockSpec((bk, li_pad, d), lambda gk, gi: (gk, 0, 0)),
        transposed_g=True,
    )
    return dt, di


# ---------------------------------------------------------------------------
# public op with custom VJP
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _maxsim_pallas(t, i, mask, li, mask_mode, bm, bk, interpret):
    """Operates on fully padded shapes; ``li`` = true image-token count."""
    out, _ = _maxsim_pallas_fwd(t, i, mask, li, mask_mode, bm, bk, interpret)
    return out


def _maxsim_pallas_fwd(t, i, mask, li, mask_mode, bm, bk, interpret):
    s = _fwd_call(t, i, mask, bm=bm, bk=bk, li=li, mask_mode=mask_mode,
                  interpret=interpret)
    return s, (t, i, mask)


def _maxsim_pallas_bwd(li, mask_mode, bm, bk, interpret, res, g):
    t, i, mask = res
    dt, di = _bwd_call(
        t, i, mask, g.astype(jnp.float32),
        bm=bm, bk=bk, li=li, mask_mode=mask_mode, interpret=interpret,
    )
    dmask = jnp.zeros_like(mask) if mask is not None else None
    return dt.astype(t.dtype), di.astype(i.dtype), dmask


_maxsim_pallas.defvjp(_maxsim_pallas_fwd, _maxsim_pallas_bwd)


def maxsim_pallas(
    token_text: jnp.ndarray,
    token_image: jnp.ndarray,
    *,
    mask_mode: str = "nonzero",
    text_mask: Optional[jnp.ndarray] = None,
    block_m: Optional[int] = None,
    block_k: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """[M,Lt,D] x [K,Li,D] -> [M,K] fp32 MaxSim via the blocked TPU kernel.

    Inputs are zero-padded to block multiples (K to a multiple of 128 for the
    lane-aligned output blocks, Li to a lane multiple) OUTSIDE the custom-vjp
    boundary, so pad/slice gradients come from standard AD and the kernels
    only see aligned shapes. block_k must divide 128.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if mask_mode == "valid" and text_mask is None:
        raise ValueError("mask_mode='valid' needs text_mask")
    if mask_mode != "valid":
        text_mask = None
    m, lt, d = token_text.shape
    k, li, _ = token_image.shape
    explicit_bk = block_k is not None
    if block_k is None:
        block_k = 8
    if block_m is None:
        # VMEM budget: worst-case live set is T block + double-buffered I
        # block + ~4 [bm*Lt, Li_pad] fp32 temporaries; these defaults keep it
        # under the 16MB scoped limit for Lt=77, Li=196, D=512. An EXPLICIT
        # block_k is honored (silently shrinking a requested block is how
        # block-size sweeps measure the wrong path).
        if token_text.dtype == jnp.bfloat16:
            block_m = 16
        else:
            block_m = 8
            if not explicit_bk:
                block_k = min(block_k, 4)
    assert _LANE % block_k == 0, "block_k must divide 128"
    bm = min(block_m, _round_up(m, 8))
    bk = block_k
    m_pad = _round_up(m, bm)
    k_pad = _round_up(k, _LANE)
    li_pad = _round_up(li, _LANE)
    t = _pad_axis0(token_text, m_pad)
    i = _pad_axis0(token_image, k_pad)
    i = jnp.pad(i, ((0, 0), (0, li_pad - li), (0, 0)))
    msk = _pad_axis0(text_mask, m_pad) if text_mask is not None else None

    s = _maxsim_pallas(t, i, msk, li, mask_mode, bm, bk, interpret)
    return s[:m, :k]

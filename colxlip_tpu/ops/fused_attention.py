"""Fused short-sequence multi-head attention (Pallas/Mosaic, TPU).

Purpose-built for the CLIP towers (vision N=197, text N=77 causal — reference
src/colxlip/transformer.py:161-166 uses torch SDPA): sequences short enough
that one (batch, head) attention problem fits whole in VMEM, so neither the
forward nor the backward ever materializes the [B, H, N, N] score tensor in
HBM. The round-2 profile showed that tensor's HBM traffic (plus the XLA
auto-remat re-execution it forces under memory pressure) costing ~190 ms of a
524 ms ViT-B/16 batch-256 train step.

Design (differs deliberately from flash attention):
  - Input is the PACKED QKV projection output ``[B, N, 3*H*D]`` exactly as
    the ``in_proj`` Dense emits it — no [B,N,H,D]->[B,H,N,D] transposes in
    or out (those transposes are why the stock flash kernel LOST end-to-end
    in the round-2 experiments, ops/attention.py:37-55).
  - Full-N blocks: no online softmax, no K/V streaming — at N<=256 the whole
    [N, N] score tile lives in VMEM registers between the two matmuls.
  - The custom-VJP backward saves NO residual beyond the qkv tensor itself
    (which already exists as the Dense output): scores and probabilities are
    recomputed in-VMEM, and the softmax-jacobian row term uses
    ``rowsum(P * dP) == rowsum(dO * O)`` so even the forward output is not
    needed.

Numerics: scores and softmax in fp32, probabilities cast to bf16 for the PV
matmul (measured neutral vs fp32 storage, and matches the reference's
fp16-AMP SDPA closer than fp32).
"""
from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _pick_block_b(b: int, bytes_per_item: int) -> int:
    """Largest batch-block that divides b and keeps the double-buffered
    block working set comfortably inside the 16 MB VMEM budget."""
    budget = 6 * 1024 * 1024
    for bb in (8, 4, 2, 1):
        if b % bb == 0 and bb * bytes_per_item * 2 <= budget:
            return bb
    return 1


def _compiler_params(bb: int, n: int, width: int, dtype):
    """Raise the scoped-VMEM cap when a large batch block is requested (the
    default 16 MB cap rejects block_b >= 4 at vision shapes; the chip has
    far more VMEM — the maxsim kernels already run with a 100 MB cap)."""
    need = bb * n * width * jnp.dtype(dtype).itemsize * 3  # blocks + temps
    if need <= 12 * 1024 * 1024:
        return None
    return pltpu.CompilerParams(
        vmem_limit_bytes=min(120 * 1024 * 1024, need * 2))


def _causal_mask(n: int):
    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return col <= row


def _unit_qk(qkv_ref, b, h, *, hd, head_dim, scale, mask):
    """Masked fp32 QK^T scores for one (batch, head) unit of a packed-QKV
    block. Shared by _fwd_kernel and _fwd_kernel_pipe — any numerics change
    here reaches both emission orders."""
    o = h * head_dim
    q = qkv_ref[b, :, o:o + head_dim]
    k = qkv_ref[b, :, hd + o:hd + o + head_dim]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    if mask is not None:
        s = jnp.where(mask, s, _NEG_INF)
    return s


def _unit_pv(qkv_ref, out_ref, b, h, s, *, hd, head_dim):
    """Softmax + PV + output write for one (batch, head) unit.

    Deferred softmax normalization: divide the [N, D] PV output by the row
    sums instead of the [N, N] probabilities — one fewer full score-tile VPU
    pass per head (exp(s-max) <= 1, so the bf16 cast loses no more than the
    normalized form did)."""
    o = h * head_dim
    e = jnp.exp(s - jnp.max(s, axis=-1, keepdims=True))
    denom = jnp.sum(e, axis=-1, keepdims=True)
    v = qkv_ref[b, :, 2 * hd + o:2 * hd + o + head_dim]
    pv = jax.lax.dot_general(
        e.astype(qkv_ref.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[b, :, o:o + head_dim] = (pv / denom).astype(out_ref.dtype)


def _fwd_kernel(qkv_ref, out_ref, *, heads: int, head_dim: int, causal: bool,
                scale: float):
    bb, n, _ = qkv_ref.shape
    hd = heads * head_dim
    mask = _causal_mask(n) if causal else None
    for b in range(bb):
        for h in range(heads):
            s = _unit_qk(qkv_ref, b, h, hd=hd, head_dim=head_dim,
                         scale=scale, mask=mask)
            _unit_pv(qkv_ref, out_ref, b, h, s, hd=hd, head_dim=head_dim)


def _bwd_kernel(qkv_ref, dout_ref, dqkv_ref, *, heads: int, head_dim: int,
                causal: bool, scale: float):
    bb, n, _ = qkv_ref.shape
    hd = heads * head_dim
    mask = _causal_mask(n) if causal else None
    for b in range(bb):
        for h in range(heads):
            o = h * head_dim
            q = qkv_ref[b, :, o:o + head_dim]
            k = qkv_ref[b, :, hd + o:hd + o + head_dim]
            v = qkv_ref[b, :, 2 * hd + o:2 * hd + o + head_dim]
            do = dout_ref[b, :, o:o + head_dim]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            if mask is not None:
                s = jnp.where(mask, s, _NEG_INF)
            p = jax.nn.softmax(s, axis=-1)
            # dP = dO @ V^T   (contraction over head_dim)
            dp = jax.lax.dot_general(
                do, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            # softmax jacobian row term: rowsum(P * dP) == rowsum(dO * O)
            delta = jnp.sum(p * dp, axis=-1, keepdims=True)
            dz = (p * (dp - delta) * scale).astype(qkv_ref.dtype)
            p16 = p.astype(qkv_ref.dtype)
            # dV = P^T @ dO ; dQ = dZ @ K ; dK = dZ^T @ Q
            dqkv_ref[b, :, 2 * hd + o:2 * hd + o + head_dim] = (
                jax.lax.dot_general(
                    p16, do, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(dqkv_ref.dtype))
            dqkv_ref[b, :, o:o + head_dim] = jax.lax.dot_general(
                dz, k, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dqkv_ref.dtype)
            dqkv_ref[b, :, hd + o:hd + o + head_dim] = jax.lax.dot_general(
                dz, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dqkv_ref.dtype)


def _fwd_kernel_pipe(qkv_ref, out_ref, *, heads: int, head_dim: int,
                     causal: bool, scale: float):
    """Software-pipelined emission order (A/B knob COLXLIP_ATTN_ORDER=pipe).

    The head-major kernel emits QK^T -> softmax -> PV strictly per (b, h)
    unit: every instruction depends on its predecessor, so the VLIW
    scheduler has no independent MXU work to pack against the softmax's VPU
    passes and the MXU idles through them (the round-3 profile's "pipeline
    bubbles"; notably the BACKWARD — where dP = dO@V^T is independent of the
    softmax and sits adjacent to it — runs at 35.8 TF/s vs the forward's
    24.7). This variant issues unit i+1's QK^T before unit i's softmax/PV,
    so at every point the scheduler sees an MXU matmul and a VPU softmax
    with no dependence between them.
    """
    bb, n, _ = qkv_ref.shape
    hd = heads * head_dim
    mask = _causal_mask(n) if causal else None
    units = [(b, h) for b in range(bb) for h in range(heads)]

    def qk(b, h):
        return _unit_qk(qkv_ref, b, h, hd=hd, head_dim=head_dim,
                        scale=scale, mask=mask)

    def pv(b, h, s):
        _unit_pv(qkv_ref, out_ref, b, h, s, hd=hd, head_dim=head_dim)

    s_prev = qk(*units[0])
    for i in range(1, len(units)):
        s_next = qk(*units[i])
        pv(*units[i - 1], s_prev)
        s_prev = s_next
    pv(*units[-1], s_prev)


def _fwd_kernel_heads(q_ref, k_ref, v_ref, out_ref, *, heads: int,
                      head_dim: int, causal: bool, scale: float):
    """Grid-over-heads forward: each grid step owns `heads` heads (a 128-wide
    feature block), letting Mosaic pipeline the next block's DMA behind this
    block's 2·heads matmuls instead of unrolling all H heads in one
    invocation."""
    bb, n, _ = q_ref.shape
    mask = _causal_mask(n) if causal else None
    for b in range(bb):
        for h in range(heads):
            o = h * head_dim
            q = q_ref[b, :, o:o + head_dim]
            k = k_ref[b, :, o:o + head_dim]
            v = v_ref[b, :, o:o + head_dim]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            if mask is not None:
                s = jnp.where(mask, s, _NEG_INF)
            e = jnp.exp(s - jnp.max(s, axis=-1, keepdims=True))
            denom = jnp.sum(e, axis=-1, keepdims=True)
            pv = jax.lax.dot_general(
                e.astype(q_ref.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            out_ref[b, :, o:o + head_dim] = (pv / denom).astype(out_ref.dtype)


def _bwd_kernel_heads(q_ref, k_ref, v_ref, dout_ref, dq_ref, dk_ref, dv_ref,
                      *, heads: int, head_dim: int, causal: bool,
                      scale: float):
    bb, n, _ = q_ref.shape
    mask = _causal_mask(n) if causal else None
    for b in range(bb):
        for h in range(heads):
            o = h * head_dim
            q = q_ref[b, :, o:o + head_dim]
            k = k_ref[b, :, o:o + head_dim]
            v = v_ref[b, :, o:o + head_dim]
            do = dout_ref[b, :, o:o + head_dim]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            if mask is not None:
                s = jnp.where(mask, s, _NEG_INF)
            p = jax.nn.softmax(s, axis=-1)
            dp = jax.lax.dot_general(
                do, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            delta = jnp.sum(p * dp, axis=-1, keepdims=True)
            dz = (p * (dp - delta) * scale).astype(q_ref.dtype)
            p16 = p.astype(q_ref.dtype)
            dv_ref[b, :, o:o + head_dim] = jax.lax.dot_general(
                p16, do, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dv_ref.dtype)
            dq_ref[b, :, o:o + head_dim] = jax.lax.dot_general(
                dz, k, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dq_ref.dtype)
            dk_ref[b, :, o:o + head_dim] = jax.lax.dot_general(
                dz, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dk_ref.dtype)


def _heads_per_block(heads: int, head_dim: int) -> int:
    """Heads per grid step such that the feature block is a 128-lane
    multiple (Mosaic last-dim constraint)."""
    per = max(1, 128 // head_dim)
    while heads % per:
        per += 1
        if per > heads:
            return heads
    return per


def _fwd_call_heads(qkv, heads, causal, block_b, interpret):
    _require_tpu(interpret)
    b, n, three_hd = qkv.shape
    hd = three_hd // 3
    head_dim = hd // heads
    scale = 1.0 / math.sqrt(head_dim)
    hpb = _heads_per_block(heads, head_dim)
    fb = hpb * head_dim
    itemsize = jnp.dtype(qkv.dtype).itemsize
    bb = block_b or _pick_block_b(b, n * 4 * fb * itemsize)
    if b % bb:
        raise ValueError(f"block_b={bb} does not divide batch {b}")
    kernel = functools.partial(
        _fwd_kernel_heads, heads=hpb, head_dim=head_dim, causal=causal,
        scale=scale)
    hblocks = heads // hpb
    # q/k/v feature offsets in units of the fb-wide block
    qspec = pl.BlockSpec((bb, n, fb), lambda i, j: (i, 0, j))
    kspec = pl.BlockSpec((bb, n, fb), lambda i, j: (i, 0, hd // fb + j))
    vspec = pl.BlockSpec((bb, n, fb), lambda i, j: (i, 0, 2 * (hd // fb) + j))
    return pl.pallas_call(
        kernel,
        grid=(b // bb, hblocks),
        in_specs=[qspec, kspec, vspec],
        out_specs=pl.BlockSpec((bb, n, fb), lambda i, j: (i, 0, j)),
        out_shape=jax.ShapeDtypeStruct((b, n, hd), qkv.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * heads * n * n * head_dim,
            bytes_accessed=qkv.size * qkv.dtype.itemsize * 4 // 3,
            transcendentals=b * heads * n * n,
        ),
        interpret=interpret,
    )(qkv, qkv, qkv)


def _bwd_call_heads(qkv, dout, heads, causal, block_b, interpret):
    _require_tpu(interpret)
    b, n, three_hd = qkv.shape
    hd = three_hd // 3
    head_dim = hd // heads
    scale = 1.0 / math.sqrt(head_dim)
    hpb = _heads_per_block(heads, head_dim)
    fb = hpb * head_dim
    itemsize = jnp.dtype(qkv.dtype).itemsize
    bb = block_b or _pick_block_b(b, n * 7 * fb * itemsize)
    if b % bb:
        raise ValueError(f"block_b={bb} does not divide batch {b}")
    kernel = functools.partial(
        _bwd_kernel_heads, heads=hpb, head_dim=head_dim, causal=causal,
        scale=scale)
    hblocks = heads // hpb
    spec = lambda off: pl.BlockSpec(  # noqa: E731
        (bb, n, fb), lambda i, j, _o=off: (i, 0, _o + j))
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(b // bb, hblocks),
        in_specs=[spec(0), spec(hd // fb), spec(2 * (hd // fb)),
                  spec(0)],
        out_specs=[pl.BlockSpec((bb, n, fb), lambda i, j: (i, 0, j))] * 3,
        out_shape=[jax.ShapeDtypeStruct((b, n, hd), qkv.dtype)] * 3,
        cost_estimate=pl.CostEstimate(
            flops=10 * b * heads * n * n * head_dim,
            bytes_accessed=qkv.size * qkv.dtype.itemsize * 7 // 3,
            transcendentals=b * heads * n * n,
        ),
        interpret=interpret,
    )(qkv, qkv, qkv, dout)
    return jnp.concatenate([dq, dk, dv], axis=-1)


def _require_tpu(interpret: bool) -> None:
    # A forced impl='fused' on a non-TPU backend dies inside Mosaic lowering
    # with an opaque error; fail with an actionable one instead (tests use
    # interpret=True, which runs anywhere).
    if not interpret and jax.default_backend() != "tpu":
        raise RuntimeError(
            "the fused packed-QKV attention kernel requires a TPU backend "
            f"(got {jax.default_backend()!r}); use attn impl 'xla', or pass "
            "interpret=True for functional testing")


def _fwd_call(qkv, heads, causal, block_b, interpret):
    _require_tpu(interpret)
    b, n, three_hd = qkv.shape
    hd = three_hd // 3
    head_dim = hd // heads
    scale = 1.0 / math.sqrt(head_dim)
    itemsize = jnp.dtype(qkv.dtype).itemsize
    bb = block_b or _pick_block_b(b, n * (three_hd + hd) * itemsize)
    if b % bb:
        raise ValueError(
            f"block_b={bb} does not divide batch {b}: the truncated grid "
            "would leave trailing output rows uninitialized")
    kernel = functools.partial(
        _fwd_kernel_pipe if _pipe_order() else _fwd_kernel,
        heads=heads, head_dim=head_dim, causal=causal, scale=scale,
    )
    flops_core = 4 * b * heads * n * n * head_dim
    return pl.pallas_call(
        kernel,
        grid=(b // bb,),
        in_specs=[pl.BlockSpec((bb, n, three_hd), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((bb, n, hd), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, hd), qkv.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops_core,
            bytes_accessed=qkv.size * qkv.dtype.itemsize * 4 // 3,
            transcendentals=b * heads * n * n,
        ),
        compiler_params=_compiler_params(bb, n, three_hd + hd, qkv.dtype),
        interpret=interpret,
    )(qkv)


def _bwd_call(qkv, dout, heads, causal, block_b, interpret):
    b, n, three_hd = qkv.shape
    hd = three_hd // 3
    head_dim = hd // heads
    scale = 1.0 / math.sqrt(head_dim)
    itemsize = jnp.dtype(qkv.dtype).itemsize
    bb = block_b or _pick_block_b(b, n * (2 * three_hd + hd) * itemsize)
    if b % bb:
        raise ValueError(
            f"block_b={bb} does not divide batch {b}: the truncated grid "
            "would leave trailing gradient rows uninitialized")
    kernel = functools.partial(
        _bwd_kernel, heads=heads, head_dim=head_dim, causal=causal,
        scale=scale,
    )
    flops_core = 10 * b * heads * n * n * head_dim
    return pl.pallas_call(
        kernel,
        grid=(b // bb,),
        in_specs=[
            pl.BlockSpec((bb, n, three_hd), lambda i: (i, 0, 0)),
            pl.BlockSpec((bb, n, hd), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((bb, n, three_hd), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, three_hd), qkv.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops_core,
            bytes_accessed=qkv.size * qkv.dtype.itemsize * 7 // 3,
            transcendentals=b * heads * n * n,
        ),
        compiler_params=_compiler_params(bb, n, 2 * three_hd + hd, qkv.dtype),
        interpret=interpret,
    )(qkv, dout)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def fused_mha_packed(qkv, heads: int, causal: bool = False,
                     block_b: int = 0, interpret: bool = False):
    """Multi-head self-attention over a packed QKV tensor.

    qkv: [B, N, 3*H*D] laid out [q | k | v] along features, each [H*D] with
    head h occupying columns h*D:(h+1)*D (exactly the packed ``in_proj``
    Dense output). Returns [B, N, H*D] — the concatenated per-head outputs,
    ready for the ``out_proj`` Dense. No [B,H,N,N] tensor in HBM, forward or
    backward.
    """
    if _grid_heads():
        return _fwd_call_heads(qkv, heads, causal, block_b, interpret)
    return _fwd_call(qkv, heads, causal, block_b, interpret)


def _pipe_order() -> bool:
    # experimental A/B knob: software-pipelined emission order in the
    # batch-grid forward kernel (see _fwd_kernel_pipe)
    return os.environ.get("COLXLIP_ATTN_ORDER", "head") == "pipe"


def _grid_heads() -> bool:
    # experimental A/B knob: grid over (batch-block, head-pair) instead of
    # unrolling all heads in one invocation (dispatch evidence in
    # docs/BENCH.md round-4)
    return os.environ.get("COLXLIP_ATTN_GRID", "batch") == "heads"


def _vjp_fwd(qkv, heads, causal, block_b, interpret):
    if _grid_heads():
        return _fwd_call_heads(qkv, heads, causal, block_b, interpret), qkv
    return _fwd_call(qkv, heads, causal, block_b, interpret), qkv


def _vjp_bwd(heads, causal, block_b, interpret, qkv, dout):
    if _grid_heads():
        return (_bwd_call_heads(qkv, dout, heads, causal, block_b, interpret),)
    return (_bwd_call(qkv, dout, heads, causal, block_b, interpret),)


fused_mha_packed.defvjp(_vjp_fwd, _vjp_bwd)


def fused_mha_reference(qkv, heads: int, causal: bool = False):
    """XLA reference path with identical semantics (oracle for tests)."""
    b, n, three_hd = qkv.shape
    hd = three_hd // 3
    head_dim = hd // heads
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, n, heads, head_dim)
    k = k.reshape(b, n, heads, head_dim)
    v = v.reshape(b, n, heads, head_dim)
    s = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                   preferred_element_type=jnp.float32)
    s = s / math.sqrt(head_dim)
    if causal:
        s = jnp.where(_causal_mask(n)[None, None], s, _NEG_INF)
    p = jax.nn.softmax(s, axis=-1).astype(qkv.dtype)
    out = jnp.einsum("bhnm,bmhd->bnhd", p, v,
                     preferred_element_type=jnp.float32)
    return out.astype(qkv.dtype).reshape(b, n, hd)

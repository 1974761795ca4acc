"""ColBERT MaxSim late-interaction similarity — the framework's hottest op.

Semantics (reference src/colxlip/loss.py:20-46 ``compute_colbert_similarity``):

    sim[m, k, n, q] = <text_token[m, n], image_token[k, q]>
    max_sim[m, k, n] = max_q sim[m, k, n, q]
    S[m, k]          = sum_n max_sim / (count_n(max_sim != 0) + 1e-8)

The reference materializes the full [M, K, Lt, Li] tensor (loss.py:34) — a
memory cliff at any real batch (SURVEY.md §7.3). Here the computation is tiled:
each (text-tile, image-tile) output block is INDEPENDENT (the max is over an
image's own tokens and the mean over a text's own tokens — no cross-tile
reduction, unlike flash-attention's softmax), so blocking is exact, not an
approximation.

Four implementations, one contract:
  - ``maxsim_xla``      : direct einsum. Reference semantics oracle; small inputs.
  - ``maxsim_streaming``: fused-einsum tiles fwd + recompute custom-VJP bwd —
                          the training path ('auto' for large shapes).
  - ``maxsim_chunked``  : nested lax.map over (M, K) tiles; differentiable via
                          AD; bounded memory; works on any backend.
  - ``maxsim_pallas``   : blocked Pallas TPU kernel (fwd + custom_vjp bwd) in
                          maxsim_pallas.py; fp32 MXU accumulation.
  - ``maxsim``          : dispatcher.

``mask_mode``:
  - 'nonzero' : the reference loss's mean over n where max_sim != 0
                (loss.py:38-44). NOTE: ColXLIP zeroes text tokens BEFORE its
                token projection head, so post-projection "padding" rows are a
                shared constant non-zero vector and this mask rarely fires; we
                reproduce the arithmetic exactly anyway.
  - 'plain'   : unmasked mean over all Lt (reference model.py:611-629).
  - 'valid'   : mean over an explicit [M, Lt] validity mask (the "intended"
                semantics; used by late-interaction retrieval scoring).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

_EPS = 1e-8


def _masked_mean_from_maxsim(
    max_sim: jnp.ndarray, mask_mode: str, text_mask: Optional[jnp.ndarray]
) -> jnp.ndarray:
    """[..., Lt] max-sims -> [...] mean with the selected masking rule."""
    if mask_mode == "nonzero":
        w = (max_sim != 0).astype(jnp.float32)
        return jnp.sum(max_sim * w, axis=-1) / (jnp.sum(w, axis=-1) + _EPS)
    if mask_mode == "plain":
        return jnp.mean(max_sim, axis=-1)
    if mask_mode == "valid":
        assert text_mask is not None, "mask_mode='valid' needs text_mask [M, Lt]"
        # text_mask broadcasts over the K axis: [M, Lt] -> [M, 1, Lt] etc.
        w = text_mask.astype(jnp.float32)
        while w.ndim < max_sim.ndim:
            w = w[:, None, :] if w.ndim == 2 else w[None]
        return jnp.sum(max_sim * w, axis=-1) / (jnp.sum(w, axis=-1) + _EPS)
    raise ValueError(f"unknown mask_mode: {mask_mode!r}")


def maxsim_xla(
    token_text: jnp.ndarray,
    token_image: jnp.ndarray,
    *,
    mask_mode: str = "nonzero",
    text_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Direct einsum path. [M,Lt,D] x [K,Li,D] -> [M,K] fp32.

    Materializes [M,K,Lt,Li] — use only for small M·K (tests, small evals).
    """
    sim = jnp.einsum(
        "mnd,kqd->mknq", token_text, token_image, preferred_element_type=jnp.float32
    )
    max_sim = jnp.max(sim, axis=3)  # [M, K, Lt]
    return _masked_mean_from_maxsim(max_sim, mask_mode, text_mask)


def _tile_maxsim(t_tile, token_image, mask_mode, mask_tile, k_chunk):
    """S rows for one text tile against ALL images, scanning image chunks."""
    def one_k_chunk(i_chunk_and_mask):
        i_chunk = i_chunk_and_mask
        sim = jnp.einsum(
            "mnd,kqd->mknq", t_tile, i_chunk, preferred_element_type=jnp.float32
        )
        max_sim = jnp.max(sim, axis=3)  # [tm, tk, Lt]
        return _masked_mean_from_maxsim(
            max_sim, mask_mode, mask_tile
        )  # [tm, tk]

    k = token_image.shape[0]
    n_k = k // k_chunk
    i_chunks = token_image.reshape(n_k, k_chunk, *token_image.shape[1:])
    s_chunks = jax.lax.map(one_k_chunk, i_chunks)  # [n_k, tm, tk]
    return jnp.moveaxis(s_chunks, 0, 1).reshape(t_tile.shape[0], k)


def maxsim_chunked(
    token_text: jnp.ndarray,
    token_image: jnp.ndarray,
    *,
    mask_mode: str = "nonzero",
    text_mask: Optional[jnp.ndarray] = None,
    m_chunk: int = 16,
    k_chunk: int = 128,
) -> jnp.ndarray:
    """Memory-bounded differentiable MaxSim: peak temp = m_chunk*k_chunk*Lt*Li fp32.

    Exact tiling (no cross-tile reductions); AD produces an equally chunked
    backward. Inputs are padded to chunk multiples and the result sliced back.
    """
    m, lt, d = token_text.shape
    k = token_image.shape[0]
    m_chunk = min(m_chunk, m)
    k_chunk = min(k_chunk, k)
    m_pad = (-m) % m_chunk
    k_pad = (-k) % k_chunk
    t = jnp.pad(token_text, ((0, m_pad), (0, 0), (0, 0)))
    i = jnp.pad(token_image, ((0, k_pad), (0, 0), (0, 0)))
    msk = None
    if text_mask is not None:
        msk = jnp.pad(text_mask, ((0, m_pad), (0, 0)))

    n_m = (m + m_pad) // m_chunk
    t_tiles = t.reshape(n_m, m_chunk, lt, d)
    if msk is not None:
        msk_tiles = msk.reshape(n_m, m_chunk, lt)
        def body(args):
            t_tile, mask_tile = args
            return _tile_maxsim(t_tile, i, mask_mode, mask_tile, k_chunk)
        s = jax.lax.map(jax.checkpoint(body), (t_tiles, msk_tiles))
    else:
        def body(t_tile):
            return _tile_maxsim(t_tile, i, mask_mode, None, k_chunk)
        s = jax.lax.map(jax.checkpoint(body), t_tiles)
    s = s.reshape(n_m * m_chunk, k + k_pad)
    return s[:m, :k]


# ---------------------------------------------------------------------------
# streaming implementation: fused-einsum forward + recompute custom VJP
# ---------------------------------------------------------------------------
#
# Round-2 measurement (v5e, batch 256, chained timing): the chunked path's
# einsum->max FORWARD is fast (XLA fuses the max reduction into the
# contraction; ~8.6 ms) but its AD BACKWARD costs 41 ms isolated and ~87 ms
# inside the train step — jax.checkpoint recomputes each tile's full body
# (max, weights, mean), materializes predicate tensors for the max gradient,
# and the extra live memory triggers XLA auto-remat elsewhere. This
# implementation keeps the proven forward structure but replaces AD:
#
#   forward: lax.map over text tiles of  einsum('mnd,kqd->mknq') -> max_q,
#     OUTPUTTING max_sim [M, K, Lt] fp32 (a few MB — the only residual).
#     The masked mean runs outside in plain jnp (cheap AD).
#   backward: custom VJP, lax.scan over the same text tiles with a carried
#     dI accumulator; per tile: one recompute einsum, routing coefficients
#     coef = (sim >= max_sim) * g built in the same fusion, and the two
#     gradient einsums. Measured 20.2 ms vs AD's 41 ms isolated.
#
# Gradient convention at ties: every token attaining the max receives the
# full cotangent (torch SDPA-style hard routing); JAX's reduce_max AD splits
# it evenly. Equal when the max is unique — ties are measure-zero in fp32
# and rare in bf16.


def _mknq_max_tiles(t, token_image, m_chunk):
    """[M, Lt, D] x [K, Li, D] -> max_sim [M, K, Lt] via fused einsum tiles."""
    m, lt, d = t.shape
    tiles = t.reshape(m // m_chunk, m_chunk, lt, d)

    def tile(t_tile):
        sim = jnp.einsum(
            "mnd,kqd->mknq", t_tile, token_image,
            preferred_element_type=jnp.float32,
        )
        return jnp.max(sim, axis=3)  # [mc, K, Lt]

    return jax.lax.map(tile, tiles).reshape(m, token_image.shape[0], lt)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _maxsim_streaming_core(t, token_image, m_chunk):
    """[M, Lt, D] x [K, Li, D] -> max_sim [M, K, Lt] fp32 (M % m_chunk == 0)."""
    return _mknq_max_tiles(t, token_image, m_chunk)


def _maxsim_streaming_fwd(t, token_image, m_chunk):
    max_sim = _mknq_max_tiles(t, token_image, m_chunk)
    return max_sim, (t, token_image)


def _maxsim_streaming_bwd(m_chunk, res, g):
    t, token_image = res
    m, lt, d = t.shape
    k, li, _ = token_image.shape
    n_tiles = m // m_chunk
    tiles_t = t.reshape(n_tiles, m_chunk, lt, d)
    tiles_g = g.astype(jnp.float32).reshape(n_tiles, m_chunk, k, lt)
    i_f32 = token_image.astype(jnp.float32)

    def body(di_acc, args):
        t_tile, g_tile = args
        sim = jnp.einsum(
            "mnd,kqd->mknq", t_tile, token_image,
            preferred_element_type=jnp.float32,
        )
        # Route against the max of THIS recomputed sim, not the saved
        # forward max: the two einsums compile in different fusion contexts,
        # and a 1-ULP accumulation difference against a saved value would
        # silently zero the whole row's gradient. Self-consistent routing
        # always hits >= 1 token (and drops the [M,K,Lt] residual).
        ms_local = jnp.max(sim, axis=3, keepdims=True)
        coef = jnp.where(sim >= ms_local, g_tile[..., None], 0.0)
        dt = jnp.einsum("mknq,kqd->mnd", coef, i_f32)
        di = jnp.einsum("mknq,mnd->kqd", coef, t_tile.astype(jnp.float32))
        return di_acc + di, dt

    di, dts = jax.lax.scan(
        body, jnp.zeros((k, li, d), jnp.float32),
        (tiles_t, tiles_g),
    )
    return (dts.reshape(m, lt, d).astype(t.dtype), di.astype(token_image.dtype))


_maxsim_streaming_core.defvjp(_maxsim_streaming_fwd, _maxsim_streaming_bwd)


def _quant_tokens_int8(x):
    """Per-token symmetric int8 over the feature dim: [..., L, D] ->
    (int8 values, [..., L] fp32 scales). A zero token row (the EOT-zeroed
    text tail the 'nonzero' mask keys on) quantizes to exact zeros, so its
    sim stays exactly 0."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    s = jnp.maximum(amax / 127.0, 1e-12)
    q = jnp.round(xf / s).astype(jnp.int8)
    return q, s[..., 0]


def _mknq_max_tiles_int8(t, token_image, m_chunk):
    """int8-MXU variant of _mknq_max_tiles: the sim einsum runs int8 x int8
    -> int32 (measured 157 vs 113 TF/s bf16 on the v5e, scripts/
    int8_probe.py) with per-token scales applied in the max's fused input.
    Token features are l2-normalized per token, so per-token symmetric int8
    carries ~1e-2 absolute sim error — forward noise only (the backward is
    straight-through on the fp inputs)."""
    m, lt, d = t.shape
    tq, ts = _quant_tokens_int8(t)
    iq, is_ = _quant_tokens_int8(token_image)
    tiles_q = tq.reshape(m // m_chunk, m_chunk, lt, d)
    tiles_s = ts.reshape(m // m_chunk, m_chunk, lt)

    def tile(args):
        tt, tscale = args
        acc = jnp.einsum("mnd,kqd->mknq", tt, iq,
                         preferred_element_type=jnp.int32)
        sim = (acc.astype(jnp.float32)
               * tscale[:, None, :, None] * is_[None, :, None, :])
        return jnp.max(sim, axis=3)  # [mc, K, Lt]

    return jax.lax.map(tile, (tiles_q, tiles_s)).reshape(
        m, token_image.shape[0], lt)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _maxsim_streaming_core_int8(t, token_image, m_chunk):
    return _mknq_max_tiles_int8(t, token_image, m_chunk)


def _maxsim_streaming_int8_fwd(t, token_image, m_chunk):
    return _mknq_max_tiles_int8(t, token_image, m_chunk), (t, token_image)


# straight-through backward: identical to the bf16 streaming path (routes
# against its own bf16 recomputed max — self-consistent by design; the int8
# forward differs only by quantization noise in the VALUE)
_maxsim_streaming_core_int8.defvjp(
    _maxsim_streaming_int8_fwd, _maxsim_streaming_bwd)


def maxsim_streaming(
    token_text: jnp.ndarray,
    token_image: jnp.ndarray,
    *,
    mask_mode: str = "nonzero",
    text_mask: Optional[jnp.ndarray] = None,
    m_chunk: int = 16,
    int8: bool = False,
) -> jnp.ndarray:
    """[M,Lt,D] x [K,Li,D] -> [M,K] fp32; peak temp one [mc,K,Lt,Li] tile."""
    m = token_text.shape[0]
    m_chunk = min(m_chunk, m)
    m_pad = (-m) % m_chunk
    t = jnp.pad(token_text, ((0, m_pad), (0, 0), (0, 0)))
    core = _maxsim_streaming_core_int8 if int8 else _maxsim_streaming_core
    max_sim = core(t, token_image, m_chunk)[:m]
    return _masked_mean_from_maxsim(max_sim, mask_mode, text_mask)


def maxsim(
    token_text: jnp.ndarray,
    token_image: jnp.ndarray,
    *,
    mask_mode: str = "nonzero",
    text_mask: Optional[jnp.ndarray] = None,
    impl: str = "auto",
    m_chunk: int = 16,
    k_chunk: int = 256,
) -> jnp.ndarray:
    """Dispatch MaxSim. impl in {'auto', 'xla', 'streaming',
    'streaming_int8', 'chunked', 'pallas'}.

    'auto' picks the STREAMING path for large problems (round-2 measurement,
    v5e batch 256: the chunked path's AD backward recomputes every sim tile
    and costs ~84 ms/step; the streaming custom-VJP backward rebuilds the
    argmax one-hot from residuals instead). The direct xla einsum stays the
    oracle for small shapes; the Pallas kernel remains available for explicit
    VMEM control experiments.
    """
    if impl == "auto":
        # xla materializes [M, K, Lt, Li] fp32 — cap by TOTAL sim elements
        # (~64 MB), not batch product; a 256x256 colclip batch is already
        # ~4 GB at Lt=77/Li=196
        sim_elems = (token_text.shape[0] * token_image.shape[0]
                     * token_text.shape[1] * token_image.shape[1])
        impl = "xla" if sim_elems <= (1 << 24) else "streaming"
    if impl == "xla":
        return maxsim_xla(token_text, token_image, mask_mode=mask_mode, text_mask=text_mask)
    if impl == "streaming":
        return maxsim_streaming(
            token_text, token_image, mask_mode=mask_mode, text_mask=text_mask,
            m_chunk=m_chunk,
        )
    if impl == "streaming_int8":
        return maxsim_streaming(
            token_text, token_image, mask_mode=mask_mode, text_mask=text_mask,
            m_chunk=m_chunk, int8=True,
        )
    if impl == "chunked":
        return maxsim_chunked(
            token_text, token_image, mask_mode=mask_mode, text_mask=text_mask,
            m_chunk=m_chunk, k_chunk=k_chunk,
        )
    if impl == "pallas":
        from .maxsim_pallas import maxsim_pallas
        return maxsim_pallas(
            token_text, token_image, mask_mode=mask_mode, text_mask=text_mask
        )
    raise ValueError(f"unknown impl: {impl!r}")

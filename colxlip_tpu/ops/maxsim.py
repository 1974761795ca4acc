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

Three implementations, one contract:
  - ``maxsim_xla``      : direct einsum. Reference semantics oracle; small inputs.
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
    """Dispatch MaxSim. impl in {'auto', 'xla', 'chunked', 'pallas'}.

    'auto' picks the CHUNKED XLA path for large problems: measured on v5e
    (round 1, 512x2048x77x196x512 bf16) XLA's fused einsum->max pipeline runs
    at ~168 TFLOP/s vs ~45 for the hand-written Pallas kernel at its current
    tile sizes — XLA fuses the max reduction into the contraction so the
    chunked path is both memory-bounded AND faster. The Pallas kernel remains
    available (exact to 1e-9) for shapes/states where explicit VMEM control
    wins; revisit its tiling before preferring it.
    """
    if impl == "auto":
        # xla materializes [M, K, Lt, Li] fp32 — cap by TOTAL sim elements
        # (~64 MB), not batch product; a 256x256 colclip batch is already
        # ~4 GB at Lt=77/Li=196
        sim_elems = (token_text.shape[0] * token_image.shape[0]
                     * token_text.shape[1] * token_image.shape[1])
        impl = "xla" if sim_elems <= (1 << 24) else "chunked"
    if impl == "xla":
        return maxsim_xla(token_text, token_image, mask_mode=mask_mode, text_mask=text_mask)
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

"""2-D sin-cos position embeddings + resolution interpolation.

Counterpart of reference src/colxlip/pos_embed.py:20-95 (itself MAE-derived),
re-implemented in numpy/jax. Used for ``pos_embed_type='sin_cos_2d'``
(reference transformer.py:563-570) and for resizing learned position embeddings
when loading a checkpoint at a different image size (reference model.py:355-418).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _sincos_1d(embed_dim: int, pos: np.ndarray) -> np.ndarray:
    assert embed_dim % 2 == 0
    omega = np.arange(embed_dim // 2, dtype=np.float64) / (embed_dim / 2.0)
    omega = 1.0 / 10000 ** omega
    out = np.einsum("m,d->md", pos.reshape(-1).astype(np.float64), omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def get_2d_sincos_pos_embed(
    embed_dim: int, grid_size: int, cls_token: bool = False
) -> np.ndarray:
    """[grid*grid (+1), embed_dim] fixed sin-cos embedding (pos_embed.py:20-45)."""
    grid_h = np.arange(grid_size, dtype=np.float32)
    grid_w = np.arange(grid_size, dtype=np.float32)
    grid = np.meshgrid(grid_w, grid_h)  # w goes first, matching MAE convention
    grid = np.stack(grid, axis=0).reshape(2, 1, grid_size, grid_size)
    emb_h = _sincos_1d(embed_dim // 2, grid[0])
    emb_w = _sincos_1d(embed_dim // 2, grid[1])
    pos_embed = np.concatenate([emb_h, emb_w], axis=1)
    if cls_token:
        pos_embed = np.concatenate([np.zeros((1, embed_dim)), pos_embed], axis=0)
    return pos_embed.astype(np.float32)


def interpolate_pos_embed(
    pos_embed: jnp.ndarray,
    new_grid: tuple,
    old_grid: tuple,
    num_prefix_tokens: int = 1,
) -> jnp.ndarray:
    """Bicubic-resample a learned [1+gh*gw, D] position table to a new grid.

    Counterpart of reference pos_embed.py:75-95 / model.py:355-418 (resize on
    checkpoint load when image_size differs).
    """
    prefix = pos_embed[:num_prefix_tokens]
    grid_embed = pos_embed[num_prefix_tokens:]
    d = grid_embed.shape[-1]
    oh, ow = old_grid
    nh, nw = new_grid
    grid_embed = grid_embed.reshape(oh, ow, d)
    resized = jax.image.resize(grid_embed, (nh, nw, d), method="bicubic")
    return jnp.concatenate([prefix, resized.reshape(nh * nw, d)], axis=0)

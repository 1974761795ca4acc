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
    grid_embed = np.asarray(grid_embed, np.float64).reshape(oh, ow, d)
    # torch-exact bicubic (a=-0.75, antialias=True, align_corners=False):
    # jax.image.resize uses the Keys a=-0.5 kernel and different antialias
    # semantics, which shifted the resized table per-element vs the
    # reference's F.interpolate and broke resolution-transfer parity
    wh = _torch_bicubic_weights(oh, nh)
    ww = _torch_bicubic_weights(ow, nw)
    resized = np.einsum("oi,iwd->owd", wh, grid_embed)
    resized = np.einsum("ow,hwd->hod", ww, resized)
    resized = jnp.asarray(resized.reshape(nh * nw, d), pos_embed.dtype)
    return jnp.concatenate([prefix, resized], axis=0)


def _torch_bicubic_weights(n_in: int, n_out: int) -> np.ndarray:
    """[n_out, n_in] row-normalized weights matching
    torch.nn.functional.interpolate(mode='bicubic', antialias=True,
    align_corners=False) along one axis (the reference resize_pos_embed,
    model.py:355-378).

    Probed against torch element-for-element: the ANTIALIAS path uses the
    PIL-compatible a=-0.5 cubic (the non-AA path uses a=-0.75), widens the
    kernel by the scale factor when DOWNSCALING, EXCLUDES out-of-range taps
    (no edge folding) and renormalizes the surviving window."""
    a = -0.5

    def cubic(x):
        x = np.abs(x)
        return np.where(
            x <= 1.0, (a + 2) * x ** 3 - (a + 3) * x ** 2 + 1,
            np.where(x < 2.0, a * x ** 3 - 5 * a * x ** 2 + 8 * a * x - 4 * a,
                     0.0))

    scale = n_in / n_out
    kernel_scale = max(scale, 1.0)  # antialias widening (downscale only)
    support = 2.0 * kernel_scale
    w = np.zeros((n_out, n_in), np.float64)
    for i in range(n_out):
        center = (i + 0.5) * scale - 0.5
        lo = max(int(np.floor(center - support)) + 1, 0)
        hi = min(int(np.floor(center + support)) + 1, n_in)
        js = np.arange(lo, hi)
        weights = cubic((js - center) / kernel_scale)
        w[i, js] = weights / weights.sum()
    return w

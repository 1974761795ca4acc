"""Planar YUV 4:2:0 feed codec: half the host->device bytes of raw RGB.

The train feed's wire format is the dominant input cost on PCIe (and on this
container's relay link): uint8 RGB is 3 bytes/px, float32 is 12. JPEG already
stores chroma at quarter resolution (4:2:0) because human-salient detail is
luma; re-shipping full-resolution chroma to the accelerator is pure waste.
This module ships the JPEG-native representation instead — 1.5 bytes/px —
and reconstructs normalized RGB on device with one fused elementwise pass
that XLA folds into the patchify matmul's input:

  host   : uint8 RGB [H, W, 3]  ->  planar uint8 [H*3//2, W]
           (rows 0..H-1 = Y; rows H..H*3//2-1 = Cb | Cr side by side at
           H/2 x W/2 each), BT.601 full-range (the JPEG matrix), 2x2 box
           chroma downsample — integer arithmetic, vectorized over the batch.
  device : triangle (libjpeg "fancy") chroma upsample + a single 3x3 affine
           that composes YUV->RGB with the OPENAI (x/255 - mean)/std
           normalization. No uint8 roundtrip on device: chroma loss is the
           only loss vs an RGB ship.

Counterpart in the reference: none — it ships normalized float32 over PCIe
(open_clip transform -> DataLoader -> .to(device), src/colxlip/train.py:124).
This path is the TPU-native redesign of that boundary.

Shapes must have even H and W (true for every CLIP resolution).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np

# BT.601 full-range (JPEG/JFIF) RGB -> YCbCr, fixed-point 16-bit coefficients.
# Rounding keeps every entry within 1 LSB of the float matrix.
_Y_R, _Y_G, _Y_B = 19595, 38470, 7471          # 0.299, 0.587, 0.114
_CB_R, _CB_G, _CB_B = -11059, -21709, 32768    # -0.168736, -0.331264, 0.5
_CR_R, _CR_G, _CR_B = 32768, -27439, -5329     # 0.5, -0.418688, -0.081312

# Inverse (YCbCr -> RGB), float: R = Y + 1.402 Cr'; G = Y - 0.344136 Cb'
# - 0.714136 Cr'; B = Y + 1.772 Cb'  (Cb' = Cb - 128, Cr' = Cr - 128).
_INV = np.array(
    [
        [1.0, 0.0, 1.402],
        [1.0, -0.344136, -0.714136],
        [1.0, 1.772, 0.0],
    ],
    np.float32,
)


def yuv420_rows(h: int) -> int:
    """Planar row count for an image of height ``h``."""
    return h + h // 2


def rgb_to_yuv420(rgb: np.ndarray) -> np.ndarray:
    """uint8 RGB [..., H, W, 3] -> planar uint8 [..., H*3//2, W].

    Batched: leading dims pass through. Integer fixed-point matches the
    float matrix within 1 LSB; chroma is the 2x2 box mean (computed on the
    box-averaged RGB — equivalent to averaging full-res chroma, the matrix
    is linear — at a quarter of the arithmetic).

    4-D uint8 batches route through the native C++ core when it's built
    (cx_rgb_to_yuv420, ~6x the numpy throughput on the 1-core feed host);
    the numpy path below is the bit-identical fallback.
    """
    if rgb.dtype != np.uint8 or rgb.shape[-1] != 3:
        raise ValueError(f"expected uint8 [..., H, W, 3], got "
                         f"{rgb.dtype} {rgb.shape}")
    h, w = rgb.shape[-3], rgb.shape[-2]
    if h % 2 or w % 2:
        raise ValueError(f"YUV420 needs even H, W; got {h}x{w}")
    if rgb.ndim == 4:
        from .. import native

        out = native.rgb_to_yuv420(rgb) if native.available() else None
        if out is not None:
            return out
    r = rgb[..., 0].astype(np.int32)
    g = rgb[..., 1].astype(np.int32)
    b = rgb[..., 2].astype(np.int32)

    y = (_Y_R * r + _Y_G * g + _Y_B * b + 32768) >> 16

    # 2x2 box mean per channel (rounded), then the chroma matrix
    def box(c):
        s = (c[..., 0::2, 0::2] + c[..., 0::2, 1::2]
             + c[..., 1::2, 0::2] + c[..., 1::2, 1::2])
        return (s + 2) >> 2

    rs, gs, bs = box(r), box(g), box(b)
    cb = ((_CB_R * rs + _CB_G * gs + _CB_B * bs + 32768) >> 16) + 128
    cr = ((_CR_R * rs + _CR_G * gs + _CR_B * bs + 32768) >> 16) + 128

    out_shape = rgb.shape[:-3] + (yuv420_rows(h), w)
    out = np.empty(out_shape, np.uint8)
    out[..., :h, :] = np.clip(y, 0, 255)
    out[..., h:, : w // 2] = np.clip(cb, 0, 255)
    out[..., h:, w // 2:] = np.clip(cr, 0, 255)
    return out


def apply_ship_format(transform, imgs: np.ndarray) -> np.ndarray:
    """Pipeline-level wire-format conversion of an assembled batch: with
    ``transform.ship == 'yuv420'`` a uint8 RGB [B, H, W, 3] batch leaves the
    host as planar YUV420 [B, H*3//2, W]. Shared by the wds and grain
    pipelines so the dispatch condition cannot diverge between them;
    per-sample transforms stay format-agnostic."""
    if getattr(transform, "ship", "rgb") == "yuv420" \
            and imgs.dtype == np.uint8 and imgs.ndim == 4:
        return rgb_to_yuv420(imgs)
    return imgs


def split_planes(yuv: np.ndarray, h: int, w: int):
    """planar [..., H*3//2, W] -> (Y [...,H,W], Cb, Cr [...,H/2,W/2])."""
    y = yuv[..., :h, :]
    cb = yuv[..., h:, : w // 2]
    cr = yuv[..., h:, w // 2:]
    return y, cb, cr


def _upsample2x_triangle_np(c: np.ndarray, axis: int) -> np.ndarray:
    """libjpeg 'fancy' 1-D 2x upsample along ``axis`` (float, no rounding):
    out[2i] = (3 c[i] + c[i-1]) / 4, out[2i+1] = (3 c[i] + c[i+1]) / 4,
    edges clamped."""
    c = np.moveaxis(c, axis, -1)
    prev = np.concatenate([c[..., :1], c[..., :-1]], axis=-1)
    nxt = np.concatenate([c[..., 1:], c[..., -1:]], axis=-1)
    even = (3.0 * c + prev) * 0.25
    odd = (3.0 * c + nxt) * 0.25
    out = np.stack([even, odd], axis=-1).reshape(c.shape[:-1] + (2 * c.shape[-1],))
    return np.moveaxis(out, -1, axis)


def yuv420_to_rgb(yuv: np.ndarray) -> np.ndarray:
    """Numpy reference decode: planar uint8 [..., H*3//2, W] -> float32 RGB
    [..., H, W, 3] in 0..255 (UNnormalized, unclipped). Mirrors the device
    math exactly — the parity oracle for :func:`decode_yuv420`."""
    rows, w = yuv.shape[-2], yuv.shape[-1]
    h = rows * 2 // 3
    y, cb, cr = split_planes(yuv, h, w)
    y = y.astype(np.float32)
    cbu = _upsample2x_triangle_np(
        _upsample2x_triangle_np(cb.astype(np.float32), -2), -1) - 128.0
    cru = _upsample2x_triangle_np(
        _upsample2x_triangle_np(cr.astype(np.float32), -2), -1) - 128.0
    r = y + 1.402 * cru
    g = y - 0.344136 * cbu - 0.714136 * cru
    b = y + 1.772 * cbu
    return np.stack([r, g, b], axis=-1)


# ---------------------------------------------------------------------------
# device side
# ---------------------------------------------------------------------------

def _upsample2x_triangle(c, axis: int):
    import jax.numpy as jnp

    c = jnp.moveaxis(c, axis, -1)
    prev = jnp.concatenate([c[..., :1], c[..., :-1]], axis=-1)
    nxt = jnp.concatenate([c[..., 1:], c[..., -1:]], axis=-1)
    even = (3.0 * c + prev) * 0.25
    odd = (3.0 * c + nxt) * 0.25
    out = jnp.stack([even, odd], axis=-1).reshape(
        c.shape[:-1] + (2 * c.shape[-1],))
    return jnp.moveaxis(out, -1, axis)


def decode_yuv420(
    yuv,
    mean: Sequence[float],
    std: Sequence[float],
):
    """Device decode: planar uint8 [B, H*3//2, W] -> normalized float32 RGB
    [B, H, W, 3].

    YUV->RGB and (x/255 - mean)/std compose into ONE 3x3 affine
    (out = A [Y, Cb-128, Cr-128]^T + b with A = INV / (255 std_c),
    b = -mean_c / std_c), so the whole decode is: two cheap separable
    upsamples + one [B*H*W, 3] @ [3, 3] matmul — all fused by XLA into the
    consumer's first op.
    """
    import jax.numpy as jnp

    rows, w = yuv.shape[-2], yuv.shape[-1]
    h = rows * 2 // 3
    if yuv420_rows(h) != rows:
        raise ValueError(f"not a planar YUV420 batch: {yuv.shape}")
    y = yuv[..., :h, :].astype(jnp.float32)
    cb = yuv[..., h:, : w // 2].astype(jnp.float32)
    cr = yuv[..., h:, w // 2:].astype(jnp.float32)
    cbu = _upsample2x_triangle(_upsample2x_triangle(cb, -2), -1) - 128.0
    cru = _upsample2x_triangle(_upsample2x_triangle(cr, -2), -1) - 128.0

    mean = np.asarray(mean, np.float32)
    std = np.asarray(std, np.float32)
    a = (_INV / (255.0 * std[:, None])).astype(np.float32)   # [3(out), 3(in)]
    b = (-mean / std).astype(np.float32)

    v = jnp.stack([y, cbu, cru], axis=-1)                    # [B, H, W, 3]
    return v @ jnp.asarray(a.T) + jnp.asarray(b)


def psnr(ref: np.ndarray, test: np.ndarray, peak: float = 255.0) -> float:
    """Peak signal-to-noise ratio in dB (test helper)."""
    mse = float(np.mean((ref.astype(np.float64) - test.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(peak * peak / mse)

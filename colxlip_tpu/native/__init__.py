"""ctypes bindings for the native C++ data-loader core.

Compiles ``dataloader.cc`` on first use (g++, cached by source hash — no
pybind11 in this image, so the ABI is plain C + ctypes). Falls back cleanly:
``available()`` is False when no compiler/libjpeg exists and callers use the
PIL path instead.
"""
from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess
import tempfile
import threading
from typing import List, Optional, Sequence, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_SRC = os.path.join(os.path.dirname(__file__), "dataloader.cc")
_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _build_lib() -> Optional[ctypes.CDLL]:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    cache_dir = os.environ.get(
        "COLXLIP_NATIVE_CACHE", os.path.join(tempfile.gettempdir(), "colxlip_native")
    )
    os.makedirs(cache_dir, exist_ok=True)
    so_path = os.path.join(cache_dir, f"dataloader_{digest}.so")
    if not os.path.exists(so_path):
        tmp = so_path + f".tmp{os.getpid()}"
        cmd = [
            "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
            _SRC, "-o", tmp, "-ljpeg", "-pthread",
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        except (OSError, subprocess.SubprocessError) as e:
            stderr = getattr(e, "stderr", b"") or b""
            logger.warning("native dataloader build failed: %s %s", e, stderr.decode()[:400])
            return None
        os.replace(tmp, so_path)
    try:
        lib = ctypes.CDLL(so_path)
    except OSError as e:
        logger.warning("native dataloader load failed: %s", e)
        return None

    lib.cx_jpeg_info.restype = ctypes.c_int
    lib.cx_jpeg_info.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.cx_process_batch.restype = ctypes.c_int
    lib.cx_process_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_size_t),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
    ]
    lib.cx_process_batch_u8.restype = ctypes.c_int
    lib.cx_process_batch_u8.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_size_t),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int),
        ctypes.c_int,
    ]
    lib.cx_rgb_to_yuv420.restype = ctypes.c_int
    lib.cx_rgb_to_yuv420.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
    ]
    return lib


def _get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    with _LOCK:
        if _LIB is None and not _TRIED:
            _LIB = _build_lib()
            _TRIED = True
    return _LIB


def available() -> bool:
    return _get_lib() is not None


def jpeg_info(data: bytes) -> Optional[Tuple[int, int]]:
    lib = _get_lib()
    if lib is None:
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    if lib.cx_jpeg_info(data, len(data), ctypes.byref(w), ctypes.byref(h)) != 0:
        return None
    return w.value, h.value


def process_batch(
    jpegs: Sequence[bytes],
    out_size: Tuple[int, int],
    mean: Sequence[float],
    std: Sequence[float],
    crops: Optional[np.ndarray] = None,
    num_threads: int = 8,
    normalize: bool = True,
) -> Tuple[np.ndarray, int]:
    """Decode+transform a batch of JPEG byte strings.

    crops: int32 [n, 4] (x, y, w, h) boxes in original image coords for
    RandomResizedCrop (drawn by the Python caller), or None for eval-style
    resize-shortest + center-crop.

    normalize=True returns float32 (x/255 - mean)/std; normalize=False
    returns raw uint8 RGB (mean/std unused) for device-side normalization —
    4x fewer host->device bytes.

    Returns ([n, H, W, 3], num_failures) — failed slots are zeroed.
    """
    lib = _get_lib()
    if lib is None:
        raise RuntimeError("native dataloader unavailable")
    n = len(jpegs)
    out_h, out_w = out_size
    arr_ptr = (ctypes.c_char_p * n)(*jpegs)
    len_arr = (ctypes.c_size_t * n)(*[len(b) for b in jpegs])
    crops_ptr = None
    if crops is not None:
        crops = np.ascontiguousarray(crops, np.int32)
        assert crops.shape == (n, 4)
        crops_ptr = crops.ctypes.data_as(ctypes.POINTER(ctypes.c_int))
    if not normalize:
        out = np.empty((n, out_h, out_w, 3), np.uint8)
        failures = lib.cx_process_batch_u8(
            arr_ptr, len_arr, n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), out_h, out_w,
            crops_ptr, num_threads,
        )
        return out, int(failures)
    out = np.empty((n, out_h, out_w, 3), np.float32)
    mean_arr = (ctypes.c_float * 3)(*[float(m) for m in mean])
    std_arr = (ctypes.c_float * 3)(*[float(s) for s in std])
    failures = lib.cx_process_batch(
        arr_ptr, len_arr, n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), out_h, out_w,
        crops_ptr, mean_arr, std_arr, num_threads,
    )
    return out, int(failures)


def rgb_to_yuv420(rgb: np.ndarray, num_threads: int = 4) -> Optional[np.ndarray]:
    """Batch uint8 RGB [n, h, w, 3] -> planar YUV420 [n, h*3//2, w], or None
    when the native lib is unavailable (callers fall back to the numpy path
    in ops/yuv420.py — bit-identical by construction, pinned by test)."""
    lib = _get_lib()
    if lib is None:
        return None
    rgb = np.ascontiguousarray(rgb)
    if rgb.dtype != np.uint8 or rgb.ndim != 4 or rgb.shape[-1] != 3:
        raise ValueError(f"expected uint8 [n, h, w, 3], got {rgb.dtype} {rgb.shape}")
    n, h, w = rgb.shape[:3]
    out = np.empty((n, h + h // 2, w), np.uint8)
    rc = lib.cx_rgb_to_yuv420(
        rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n, h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), num_threads,
    )
    if rc != 0:
        raise ValueError(f"YUV420 needs even H, W; got {h}x{w}")
    return out


# ---------------------------------------------------------------------------
# native BPE tokenizer (bpe_tokenizer.cc) — separate .so, no libjpeg needed
# ---------------------------------------------------------------------------

_TOK_SRC = os.path.join(os.path.dirname(__file__), "bpe_tokenizer.cc")
_TOK_LIB = None
_TOK_TRIED = False


def _build_tok_lib() -> Optional[ctypes.CDLL]:
    with open(_TOK_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    cache_dir = os.environ.get(
        "COLXLIP_NATIVE_CACHE", os.path.join(tempfile.gettempdir(), "colxlip_native")
    )
    os.makedirs(cache_dir, exist_ok=True)
    so_path = os.path.join(cache_dir, f"bpe_tokenizer_{digest}.so")
    if not os.path.exists(so_path):
        tmp = so_path + f".tmp{os.getpid()}"
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _TOK_SRC, "-o", tmp]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        except (OSError, subprocess.SubprocessError) as e:
            stderr = getattr(e, "stderr", b"") or b""
            logger.warning("native tokenizer build failed: %s %s", e, stderr.decode()[:400])
            return None
        os.replace(tmp, so_path)
    try:
        lib = ctypes.CDLL(so_path)
    except OSError as e:
        logger.warning("native tokenizer load failed: %s", e)
        return None
    lib.cx_bpe_init.restype = ctypes.c_int
    lib.cx_bpe_init.argtypes = [ctypes.c_char_p, ctypes.c_size_t]
    lib.cx_bpe_encode_batch.restype = ctypes.c_int
    lib.cx_bpe_encode_batch.argtypes = [
        ctypes.c_int, ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_int32),
    ]
    lib.cx_bpe_free.restype = None
    lib.cx_bpe_free.argtypes = [ctypes.c_int]
    return lib


def _get_tok_lib() -> Optional[ctypes.CDLL]:
    global _TOK_LIB, _TOK_TRIED
    if _TOK_LIB is not None or _TOK_TRIED:
        return _TOK_LIB
    with _LOCK:
        if _TOK_LIB is None and not _TOK_TRIED:
            _TOK_LIB = _build_tok_lib()
            _TOK_TRIED = True
    return _TOK_LIB


def tokenizer_available() -> bool:
    return _get_tok_lib() is not None


def bpe_init(merges_blob: bytes) -> Optional[int]:
    """Build a native tokenizer over the given merge table ('first second'
    lines, UTF-8; empty = the zero-merges fallback layout). Returns a handle
    for bpe_encode_batch, or None when the native core is unavailable."""
    lib = _get_tok_lib()
    if lib is None:
        return None
    handle = lib.cx_bpe_init(merges_blob, len(merges_blob))
    return None if handle < 0 else int(handle)


def bpe_free(handle: int) -> None:
    """Release a native tokenizer handle (idempotent; safe at shutdown)."""
    lib = _TOK_LIB  # don't (re)build during interpreter teardown
    if lib is None or handle is None:
        return
    try:
        lib.cx_bpe_free(handle)
    except Exception:  # noqa: BLE001 — teardown-time ctypes may be gone
        pass


def bpe_encode_batch(handle: int, texts: Sequence[bytes], context_length: int) -> np.ndarray:
    """Tokenize ASCII-eligible byte strings -> [n, ctx] int32 (SOT...EOT,
    zero-padded, EOT-forced truncation — SimpleTokenizer.__call__ layout)."""
    lib = _get_tok_lib()
    if lib is None:
        raise RuntimeError("native tokenizer unavailable")
    n = len(texts)
    out = np.zeros((n, context_length), np.int32)
    if n == 0:
        return out
    arr_ptr = (ctypes.c_char_p * n)(*texts)
    rc = lib.cx_bpe_encode_batch(
        handle, arr_ptr, n, context_length,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if rc != 0:
        raise RuntimeError(f"native tokenizer encode failed (rc={rc})")
    return out

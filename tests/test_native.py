"""Native C++ data-loader core: build, decode correctness vs PIL, batching."""
import io

import numpy as np
import pytest

from colxlip_tpu import native
from colxlip_tpu.data.transforms import (
    OPENAI_DATASET_MEAN,
    OPENAI_DATASET_STD,
    image_transform,
)

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native dataloader unavailable (no g++/libjpeg)"
)


def _jpeg_bytes(rng, w=120, h=90, quality=95):
    from PIL import Image

    arr = (rng.random((h, w, 3)) * 255).astype(np.uint8)
    img = Image.fromarray(arr)
    buf = io.BytesIO()
    img.save(buf, format="JPEG", quality=quality)
    return buf.getvalue()


def test_jpeg_info(rng):
    data = _jpeg_bytes(rng, w=123, h=77)
    assert native.jpeg_info(data) == (123, 77)
    assert native.jpeg_info(b"not a jpeg") is None


def test_eval_transform_close_to_pil(rng):
    """Eval path (resize-shortest + center crop) within tolerance of the PIL
    pipeline (bilinear vs bicubic -> loose but bounded difference)."""
    from PIL import Image

    data = _jpeg_bytes(rng, w=200, h=160)
    out, failures = native.process_batch(
        [data], (64, 64), OPENAI_DATASET_MEAN, OPENAI_DATASET_STD
    )
    assert failures == 0
    assert out.shape == (1, 64, 64, 3)
    pil_t = image_transform(64, is_train=False, interpolation="bilinear")
    want = pil_t(Image.open(io.BytesIO(data)))
    # un-normalized RMS error in pixel units
    std = np.asarray(OPENAI_DATASET_STD)
    diff = (out[0] - want) * std * 255.0
    rms = float(np.sqrt(np.mean(diff ** 2)))
    assert rms < 12.0, rms  # decode + resample implementation differences


def test_train_crops(rng):
    data = _jpeg_bytes(rng, w=100, h=80)
    crops = np.array([[10, 5, 60, 60]], np.int32)
    out, failures = native.process_batch(
        [data], (32, 32), OPENAI_DATASET_MEAN, OPENAI_DATASET_STD, crops=crops
    )
    assert failures == 0
    assert np.isfinite(out).all()
    # a different crop gives different pixels
    out2, _ = native.process_batch(
        [data], (32, 32), OPENAI_DATASET_MEAN, OPENAI_DATASET_STD,
        crops=np.array([[30, 15, 50, 50]], np.int32),
    )
    assert not np.allclose(out, out2)


def test_corrupt_sample_zeroed(rng):
    good = _jpeg_bytes(rng)
    out, failures = native.process_batch(
        [good, b"garbage bytes"], (32, 32), OPENAI_DATASET_MEAN, OPENAI_DATASET_STD
    )
    assert failures == 1
    assert np.abs(out[0]).sum() > 0
    assert np.abs(out[1]).sum() == 0


def test_batch_threads(rng):
    batch = [_jpeg_bytes(rng, w=64 + i, h=64 + i) for i in range(16)]
    out, failures = native.process_batch(
        batch, (48, 48), OPENAI_DATASET_MEAN, OPENAI_DATASET_STD, num_threads=4
    )
    assert failures == 0
    assert out.shape == (16, 48, 48, 3)
    assert np.isfinite(out).all()


def test_native_vs_pil_throughput(rng):
    """Sanity: native batch decode should beat single-thread PIL clearly."""
    import time
    from PIL import Image

    batch = [_jpeg_bytes(rng, w=640, h=480) for _ in range(32)]
    t0 = time.perf_counter()
    native.process_batch(batch, (224, 224), OPENAI_DATASET_MEAN,
                         OPENAI_DATASET_STD, num_threads=8)
    t_native = time.perf_counter() - t0

    pil_t = image_transform(224, is_train=False)
    t0 = time.perf_counter()
    for b in batch:
        pil_t(Image.open(io.BytesIO(b)))
    t_pil = time.perf_counter() - t0
    # not a strict benchmark; just catch pathological slowness
    assert t_native < t_pil * 1.5, (t_native, t_pil)

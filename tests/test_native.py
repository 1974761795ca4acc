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


def test_uint8_mode_matches_float_path(rng):
    """normalize=False returns uint8 whose device-side renormalization equals
    the float path to within the uint8 rounding bound (0.5/255/std)."""
    batch = [_jpeg_bytes(rng, w=100 + i, h=90 + i) for i in range(4)]
    f32, fail_f = native.process_batch(
        batch, (64, 64), OPENAI_DATASET_MEAN, OPENAI_DATASET_STD)
    u8, fail_u = native.process_batch(
        batch, (64, 64), OPENAI_DATASET_MEAN, OPENAI_DATASET_STD,
        normalize=False)
    assert fail_f == fail_u == 0
    assert u8.dtype == np.uint8 and u8.shape == (4, 64, 64, 3)
    mean = np.asarray(OPENAI_DATASET_MEAN, np.float32)
    std = np.asarray(OPENAI_DATASET_STD, np.float32)
    renorm = (u8.astype(np.float32) / 255.0 - mean) / std
    bound = 0.5 / 255.0 / std.min() + 1e-4
    assert np.abs(renorm - f32).max() <= bound


def test_uint8_mode_crops_and_failures(rng):
    data = _jpeg_bytes(rng, w=100, h=80)
    crops = np.array([[10, 5, 60, 60], [0, 0, 80, 80]], np.int32)
    u8, failures = native.process_batch(
        [data, b"corrupt"], (32, 32), OPENAI_DATASET_MEAN, OPENAI_DATASET_STD,
        crops=crops, normalize=False)
    assert failures == 1
    assert u8[1].max() == 0  # failed slot zeroed
    assert u8[0].max() > 0


def test_transform_normalize_on_device(rng):
    """ImageTransform with normalize_on_device emits uint8; device-side
    renorm equals the normal transform output exactly (PIL resize already
    produces uint8, so no rounding is lost)."""
    import io as _io
    from PIL import Image

    data = _jpeg_bytes(rng, w=128, h=96)
    img = Image.open(_io.BytesIO(data))
    t_f = image_transform(64, is_train=False)
    t_u = image_transform(64, is_train=False, normalize_on_device=True)
    f = t_f(img)
    u = t_u(img)
    assert u.dtype == np.uint8
    mean = np.asarray(OPENAI_DATASET_MEAN, np.float32)
    std = np.asarray(OPENAI_DATASET_STD, np.float32)
    np.testing.assert_allclose(
        (u.astype(np.float32) / 255.0 - mean) / std, f, atol=1e-6)


def test_vision_tower_uint8_dispatch(rng):
    """The vision tower normalizes integer inputs on-device; features match
    a host-normalized float feed bitwise (same fp32 ops before bf16 cast)."""
    import jax
    import jax.numpy as jnp
    from colxlip_tpu.models import CLIP, CLIPCfg, get_model_config

    cfg = CLIPCfg.from_dict(get_model_config("ViT-S-16-test"))
    model = CLIP(cfg, dtype=jnp.float32)
    u8 = (rng.random((2, cfg.vision_cfg.image_size,
                      cfg.vision_cfg.image_size, 3)) * 255).astype(np.uint8)
    mean = np.asarray(cfg.vision_cfg.image_mean, np.float32)
    std = np.asarray(cfg.vision_cfg.image_std, np.float32)
    f32 = (u8.astype(np.float32) / 255.0 - mean) / std
    texts = np.zeros((2, cfg.text_cfg.context_length), np.int32)
    texts[:, 0] = 49406
    texts[:, 1] = 49407
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(u8),
                        jnp.asarray(texts))
    out_u = model.apply(params, jnp.asarray(u8), jnp.asarray(texts))
    out_f = model.apply(params, jnp.asarray(f32), jnp.asarray(texts))
    np.testing.assert_allclose(
        np.asarray(out_u["image_features"]),
        np.asarray(out_f["image_features"]), atol=1e-6)

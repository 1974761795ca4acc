"""YUV 4:2:0 feed codec (ops/yuv420.py): the half-bytes wire format.

Covers: fixed-point encode accuracy vs the float matrix, device decode ==
numpy reference decode, roundtrip quality on smooth (photo-like) content,
lossless-chroma cases, the vision tower accepting the planar batch, and the
pipeline-level wire conversion.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from colxlip_tpu.ops.yuv420 import (
    decode_yuv420,
    psnr,
    rgb_to_yuv420,
    split_planes,
    yuv420_rows,
    yuv420_to_rgb,
)
from colxlip_tpu.data.transforms import (
    OPENAI_DATASET_MEAN,
    OPENAI_DATASET_STD,
)


def _smooth_rgb(rng, h=64, w=64, n=4):
    """Photo-like content: low-frequency fields (bilinear-upsampled noise),
    not white noise — real photos have smooth chroma, which is WHY 4:2:0
    exists."""
    from PIL import Image

    out = np.empty((n, h, w, 3), np.uint8)
    for i in range(n):
        small = rng.uniform(0, 255, (h // 8, w // 8, 3)).astype(np.uint8)
        img = Image.fromarray(small).resize((w, h), Image.BILINEAR)
        arr = np.asarray(img, np.float64) + rng.normal(0, 3, (h, w, 3))
        out[i] = np.clip(arr, 0, 255).astype(np.uint8)
    return out


def test_encode_matches_float_matrix_within_1lsb():
    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 256, (2, 16, 16, 3), np.uint8)
    got = rgb_to_yuv420(rgb)
    r, g, b = (rgb[..., i].astype(np.float64) for i in range(3))
    y_f = 0.299 * r + 0.587 * g + 0.114 * b
    np.testing.assert_allclose(
        got[..., :16, :].astype(np.float64), np.round(y_f), atol=1.0)
    # chroma on the 2x2 box mean
    def box(c):
        return (c[..., 0::2, 0::2] + c[..., 0::2, 1::2]
                + c[..., 1::2, 0::2] + c[..., 1::2, 1::2]) / 4.0
    rs, gs, bs = box(r), box(g), box(b)
    cb_f = 128 - 0.168736 * rs - 0.331264 * gs + 0.5 * bs
    cr_f = 128 + 0.5 * rs - 0.418688 * gs - 0.081312 * bs
    y, cb, cr = split_planes(got, 16, 16)
    np.testing.assert_allclose(cb.astype(np.float64), cb_f, atol=1.5)
    np.testing.assert_allclose(cr.astype(np.float64), cr_f, atol=1.5)


def test_device_decode_matches_numpy_reference():
    rng = np.random.default_rng(1)
    rgb = _smooth_rgb(rng, 32, 48, n=2)
    yuv = rgb_to_yuv420(rgb)
    ref = yuv420_to_rgb(yuv)  # float 0..255, unnormalized
    mean = np.asarray(OPENAI_DATASET_MEAN, np.float32)
    std = np.asarray(OPENAI_DATASET_STD, np.float32)
    ref_norm = (ref / 255.0 - mean) / std
    dev = np.asarray(decode_yuv420(jnp.asarray(yuv), mean, std))
    np.testing.assert_allclose(dev, ref_norm, atol=2e-4)


def test_roundtrip_psnr_on_smooth_content():
    rng = np.random.default_rng(2)
    rgb = _smooth_rgb(rng, 64, 64, n=4)
    back = np.clip(yuv420_to_rgb(rgb_to_yuv420(rgb)), 0, 255)
    assert psnr(rgb, back) > 35.0, psnr(rgb, back)


def test_gray_images_roundtrip_near_lossless():
    """R=G=B => chroma is constant 128; only Y rounding (<=1 LSB) remains."""
    v = np.arange(256, dtype=np.uint8).reshape(16, 16)
    rgb = np.stack([v, v, v], axis=-1)[None]
    back = yuv420_to_rgb(rgb_to_yuv420(rgb))
    assert np.max(np.abs(back - rgb.astype(np.float32))) <= 1.0


def test_rows_helper_and_shape_validation():
    assert yuv420_rows(224) == 336
    with pytest.raises(ValueError):
        rgb_to_yuv420(np.zeros((15, 16, 3), np.uint8))  # odd H
    with pytest.raises(ValueError):
        rgb_to_yuv420(np.zeros((16, 16, 3), np.float32))  # wrong dtype


def test_vision_tower_accepts_planar_batch():
    """[B, H*3//2, W] uint8 must flow through the tower; on chroma-flat
    input the result matches the uint8 RGB feed closely (the only deltas:
    Y rounding and fp32 affine order)."""
    from colxlip_tpu.models import CLIPVisionCfg, VisionTransformer

    cfg = CLIPVisionCfg(layers=2, width=64, head_width=32, patch_size=16,
                        image_size=64)
    tower = VisionTransformer(cfg, embed_dim=32, dtype=jnp.float32)
    v = (np.linspace(40, 200, 64 * 64).reshape(64, 64)).astype(np.uint8)
    rgb = np.stack([v, v, v], axis=-1)[None]  # gray: lossless chroma
    params = tower.init(jax.random.PRNGKey(0), jnp.asarray(rgb))
    pooled_rgb, tokens_rgb = tower.apply(params, jnp.asarray(rgb))
    yuv = rgb_to_yuv420(rgb)
    assert yuv.shape == (1, 96, 64)
    pooled_yuv, tokens_yuv = tower.apply(params, jnp.asarray(yuv))
    assert pooled_yuv.shape == pooled_rgb.shape
    np.testing.assert_allclose(np.asarray(pooled_yuv), np.asarray(pooled_rgb),
                               atol=5e-2)


def test_native_encoder_bit_identical_to_numpy():
    """cx_rgb_to_yuv420 (C++ core) == the numpy fixed-point path, byte for
    byte — the fallback must be indistinguishable."""
    from colxlip_tpu import native

    if not native.available():
        pytest.skip("native dataloader lib unavailable")
    rng = np.random.default_rng(7)
    batch = rng.integers(0, 256, (3, 32, 48, 3), np.uint8)
    got_native = native.rgb_to_yuv420(batch)
    # force the numpy path by encoding per-image (3-D skips native dispatch)
    got_numpy = np.stack([rgb_to_yuv420(img) for img in batch])
    np.testing.assert_array_equal(got_native, got_numpy)


def test_transform_ship_flag_implies_device_normalize():
    from colxlip_tpu.data.transforms import image_transform

    t = image_transform(64, is_train=True, seed=0, ship="yuv420")
    assert t.normalize_on_device
    assert t.ship == "yuv420"
    with pytest.raises(ValueError):
        image_transform(64, is_train=True, ship="nv12")


def test_wds_ship_format_batch_conversion():
    """The pipeline's wire conversion: assembled uint8 RGB batch ->
    planar YUV420."""
    from colxlip_tpu.data.transforms import image_transform
    from colxlip_tpu.data.wds import WdsTrainPipeline

    t = image_transform(64, is_train=True, seed=0, ship="yuv420")
    pipe = WdsTrainPipeline.__new__(WdsTrainPipeline)  # only needs .transform
    pipe.transform = t
    rng = np.random.default_rng(3)
    batch = _smooth_rgb(rng, 64, 64, n=4)
    out = pipe._ship_format(batch)
    assert out.shape == (4, 96, 64) and out.dtype == np.uint8
    # rgb transform passes through untouched
    pipe.transform = image_transform(64, is_train=True, seed=0)
    assert pipe._ship_format(batch) is batch


def test_train_step_runs_on_yuv_batch():
    """End-to-end: the jitted train step consumes a planar YUV420 batch."""
    from colxlip_tpu.models import CLIPCfg, ColXLIP, get_model_config
    from colxlip_tpu.parallel.train_step import (
        TrainStepConfig,
        init_train_state,
        make_train_step,
    )
    from colxlip_tpu.training.optim import create_optimizer
    from colxlip_tpu.training.schedules import cosine_lr

    cfg = CLIPCfg.from_dict(get_model_config("ViT-S-16-test"))
    model = ColXLIP(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(4)
    size = cfg.vision_cfg.image_size
    rgb = _smooth_rgb(rng, size, size, n=8)
    yuv = jnp.asarray(rgb_to_yuv420(rgb))
    txt = np.zeros((8, 32), np.int32)
    txt[:, 0] = 49406
    txt[:, 1] = rng.integers(1, 100, 8)
    txt[:, 2] = 49407
    txt = jnp.asarray(txt)

    tx = create_optimizer(cosine_lr(1e-3, 10, 100), weight_decay=0.1)
    state = init_train_state(model, tx, jax.random.PRNGKey(0), yuv[:2], txt[:2])
    step = make_train_step(
        model, tx, TrainStepConfig(loss_type="colclip", maxsim_impl="xla"),
        donate=False)
    _, metrics = step(state, yuv, txt)
    assert np.isfinite(float(metrics["total_loss"]))

"""Packed raw-uint8 shard path (colxlip_tpu/data/pack.py).

SURVEY.md §7.3 prescribes ahead-of-time resized shards for the pod-scale
feed; these tests pin the record format, the pack tool, augmentation
semantics on raw records, and the end-to-end wds/grain pipeline behavior.
"""
import io
import json
import os
import random
import tarfile

import numpy as np
import pytest
from PIL import Image

from colxlip_tpu.data.pack import (
    decode_raw,
    encode_raw,
    pack_shard,
    pack_shards,
)
from colxlip_tpu.data.transforms import image_transform, resize_shortest
from colxlip_tpu.data.wds import (
    WdsConfig,
    WdsTrainPipeline,
    get_dataset_size,
    iter_tar_samples,
)


def _write_shard(path, n=6, hw=(96, 128), caption_key="txt"):
    rng = np.random.default_rng(hash(os.path.basename(str(path))) % 2**31)
    with tarfile.open(path, "w") as tf:
        for i in range(n):
            key = f"{i:05d}"
            img = Image.fromarray(
                (rng.random((hw[0], hw[1], 3)) * 255).astype(np.uint8))
            buf = io.BytesIO()
            img.save(buf, format="JPEG", quality=95)
            data = buf.getvalue()
            info = tarfile.TarInfo(f"{key}.jpg")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
            if caption_key == "txt":
                cap = f"caption {key}".encode()
            else:
                cap = json.dumps({"raw_caption": [f"caption {key}"]}).encode()
            info = tarfile.TarInfo(f"{key}.{caption_key}")
            info.size = len(cap)
            tf.addfile(info, io.BytesIO(cap))
    return str(path)


class _IdTokenizer:
    context_length = 16

    def __call__(self, texts):
        out = np.zeros((len(texts), self.context_length), np.int32)
        out[:, 0] = 49406
        for i, t in enumerate(texts):
            out[i, 1] = (len(t) % 100) + 1
            out[i, 2] = 49407
        return out


def test_raw_record_roundtrip():
    arr = np.arange(5 * 7 * 3, dtype=np.uint8).reshape(5, 7, 3)
    rec = encode_raw(arr)
    out = decode_raw(rec)
    np.testing.assert_array_equal(out, arr)


def test_raw_record_validation():
    with pytest.raises(ValueError):
        encode_raw(np.zeros((4, 4, 3), np.float32))  # wrong dtype
    rec = encode_raw(np.zeros((4, 4, 3), np.uint8))
    with pytest.raises(ValueError):
        decode_raw(b"XXXX" + rec[4:])  # bad magic
    with pytest.raises(ValueError):
        decode_raw(rec[:-1])  # truncated payload


def test_pack_shard_members_and_sizes(tmp_path):
    src = _write_shard(tmp_path / "src.tar", n=5, caption_key="json")
    dst = str(tmp_path / "packed.tar")
    n = pack_shard(src, dst, size=64)
    assert n == 5
    samples = list(iter_tar_samples(dst))
    assert len(samples) == 5
    for s in samples:
        assert "raw" in s and "json" in s
        arr = decode_raw(s["raw"])
        assert arr.dtype == np.uint8 and min(arr.shape[:2]) == 64
    # captions pass through byte-identical
    src_samples = {s["__key__"]: s for s in iter_tar_samples(src)}
    for s in samples:
        assert s["json"] == src_samples[s["__key__"]]["json"]


def test_pack_shards_writes_sizes_json(tmp_path):
    for i in range(2):
        _write_shard(tmp_path / f"shard-{i:04d}.tar", n=3 + i)
    out_dir = str(tmp_path / "packed")
    paths, total = pack_shards(
        str(tmp_path / "shard-{0000..0001}.tar"), out_dir, size=48)
    assert len(paths) == 2 and total == 7
    with open(os.path.join(out_dir, "sizes.json")) as f:
        sizes = json.load(f)
    assert sizes == {"shard-0000.tar": 3, "shard-0001.tar": 4}
    # the pipeline's size discovery reads the sidecar
    assert get_dataset_size(paths) == 7


def test_apply_raw_rrc_matches_pil_path():
    """'rrc' on a raw record == the PIL path on the same pre-resized image."""
    rng_img = np.random.default_rng(0)
    arr = (rng_img.random((80, 112, 3)) * 255).astype(np.uint8)
    t = image_transform(48, is_train=True, raw_aug="rrc")
    a = t.apply_raw(arr, rng=random.Random(7))
    b = t(Image.fromarray(arr), rng=random.Random(7))
    np.testing.assert_array_equal(a, b)


def test_apply_raw_crop_mode_semantics():
    arr = np.zeros((64, 64, 3), np.uint8)
    arr[10:58, 12:60] = 255
    t = image_transform(48, is_train=True, raw_aug="crop")
    out = t.apply_raw(arr, rng=random.Random(3))
    assert out.shape == (48, 48, 3) and out.dtype == np.float32
    # a crop is a slice: every output pixel exists somewhere in the input
    # (check via the normalized value set: only 0 and 255 sources)
    t8 = image_transform(48, is_train=True, raw_aug="crop",
                         normalize_on_device=True)
    out8 = t8.apply_raw(arr, rng=random.Random(3))
    assert out8.dtype == np.uint8
    assert set(np.unique(out8)) <= {0, 255}
    # same rng -> same crop in both output modes
    ref = t8.apply_raw(arr, rng=random.Random(3))
    np.testing.assert_array_equal(out8, ref)


def test_apply_raw_crop_falls_back_when_smaller():
    """Records smaller than the crop route through the PIL (upscale) path."""
    arr = (np.random.default_rng(1).random((32, 40, 3)) * 255).astype(np.uint8)
    t = image_transform(48, is_train=True, raw_aug="crop")
    out = t.apply_raw(arr, rng=random.Random(5))
    assert out.shape == (48, 48, 3)


def test_apply_raw_eval_center_crop():
    arr = (np.random.default_rng(2).random((64, 96, 3)) * 255).astype(np.uint8)
    t = image_transform(48, is_train=False)
    out = t.apply_raw(arr, rng=None)
    ref = t(Image.fromarray(arr))
    np.testing.assert_array_equal(out, ref)


def test_eval_parity_packed_at_crop_size():
    """Packing at the eval size makes raw eval == PIL eval exactly
    (resize_shortest happens once at pack time, center crop is the rest)."""
    rng_img = np.random.default_rng(3)
    img = Image.fromarray((rng_img.random((90, 70, 3)) * 255).astype(np.uint8))
    t = image_transform(48, is_train=False)
    packed = np.asarray(resize_shortest(img, 48, t.interp), np.uint8)
    np.testing.assert_array_equal(t.apply_raw(packed), t(img))


@pytest.mark.parametrize("raw_aug", ["rrc", "crop"])
def test_wds_pipeline_on_packed_shards(tmp_path, raw_aug):
    for i in range(2):
        _write_shard(tmp_path / f"shard-{i:04d}.tar", n=8)
    out_dir = str(tmp_path / "packed")
    pack_shards(str(tmp_path / "shard-{0000..0001}.tar"), out_dir, size=56)
    cfg = WdsConfig(
        urls=os.path.join(out_dir, "shard-{0000..0001}.tar"),
        batch_size=4, num_samples=16, seed=0, num_workers=2,
        shuffle_buffer=8, shuffle_initial=4, caption_key="txt",
    )
    transform = image_transform(48, is_train=True, raw_aug=raw_aug,
                                normalize_on_device=True)
    pipe = WdsTrainPipeline(cfg, transform, _IdTokenizer())
    batches = list(pipe)
    assert len(batches) == pipe.num_batches == 4
    for imgs, txts in batches:
        assert imgs.shape == (4, 48, 48, 3) and imgs.dtype == np.uint8
        assert txts.shape[0] == 4 and txts.dtype == np.int32
        assert (txts[..., 0] == 49406).all()


def test_grain_pipeline_on_packed_shards(tmp_path):
    grain = pytest.importorskip("grain")  # noqa: F841
    from colxlip_tpu.data.grain_pipeline import GrainTrainPipeline

    _write_shard(tmp_path / "shard-0000.tar", n=8)
    out_dir = str(tmp_path / "packed")
    pack_shards(str(tmp_path / "shard-0000.tar"), out_dir, size=56)
    cfg = WdsConfig(
        urls=os.path.join(out_dir, "shard-0000.tar"),
        batch_size=4, num_samples=8, seed=0, num_workers=0,
        shuffle_buffer=0, caption_key="txt",
    )
    transform = image_transform(48, is_train=True, raw_aug="crop")
    pipe = GrainTrainPipeline(cfg, transform, _IdTokenizer())
    imgs, txts = next(iter(pipe))
    assert imgs.shape == (4, 48, 48, 3)
    assert imgs.dtype == np.float32


def test_pack_refuses_already_packed_shard(tmp_path):
    """Re-packing a packed shard raises instead of emitting a 0-sample tar."""
    src = _write_shard(tmp_path / "src.tar", n=3)
    packed = str(tmp_path / "packed.tar")
    pack_shard(src, packed, size=48)
    with pytest.raises(ValueError, match="already"):
        pack_shard(packed, str(tmp_path / "double.tar"), size=48)


def test_pack_passes_through_extra_sidecar_members(tmp_path):
    """Non-image members beyond json/txt survive packing byte-identical."""
    src = str(tmp_path / "src.tar")
    meta = b"id\tscore\n0\t0.7\n"
    with tarfile.open(src, "w") as tf:
        img = Image.fromarray(np.zeros((64, 64, 3), np.uint8))
        buf = io.BytesIO()
        img.save(buf, format="JPEG")
        for name, data in [("00000.jpg", buf.getvalue()),
                           ("00000.txt", b"a caption"),
                           ("00000.meta.tsv", meta)]:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    dst = str(tmp_path / "packed.tar")
    assert pack_shard(src, dst, size=48) == 1
    (sample,) = iter_tar_samples(dst)
    assert sample["txt"] == b"a caption"
    assert sample["meta.tsv"] == meta
    assert "jpg" not in sample and "raw" in sample


def test_pack_shards_rejects_duplicate_basenames(tmp_path):
    """Two sources expanding to the same basename would collide in out_dir."""
    (tmp_path / "a").mkdir()
    (tmp_path / "b").mkdir()
    _write_shard(tmp_path / "a" / "shard-0000.tar", n=2)
    _write_shard(tmp_path / "b" / "shard-0000.tar", n=2)
    spec = f"{tmp_path}/a/shard-0000.tar::{tmp_path}/b/shard-0000.tar"
    with pytest.raises(ValueError, match="duplicate shard basenames"):
        pack_shards(spec, str(tmp_path / "packed"), size=48)


def test_pack_warns_on_zero_samples(tmp_path, caplog):
    """A shard with no decodable images packs to 0 samples with a warning."""
    src = str(tmp_path / "src.tar")
    with tarfile.open(src, "w") as tf:
        data = b"not an image"
        info = tarfile.TarInfo("00000.jpg")
        info.size = len(data)
        tf.addfile(info, io.BytesIO(data))
    import logging as _logging
    with caplog.at_level(_logging.WARNING, logger="colxlip_tpu.data.pack"):
        n = pack_shard(src, str(tmp_path / "packed.tar"), size=48)
    assert n == 0
    assert any("0 samples" in r.message for r in caplog.records)


def test_pack_cli(tmp_path, capsys):
    from colxlip_tpu.data.pack import main

    _write_shard(tmp_path / "shard-0000.tar", n=3)
    out_dir = str(tmp_path / "packed")
    rc = main(["--urls", str(tmp_path / "shard-0000.tar"),
               "--out-dir", out_dir, "--size", "48"])
    assert rc == 0
    assert "3 samples" in capsys.readouterr().out
    assert os.path.exists(os.path.join(out_dir, "shard-0000.tar"))
    assert os.path.exists(os.path.join(out_dir, "sizes.json"))

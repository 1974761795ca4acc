"""Packed single-transfer feed (parallel/data_feed.pack_batch/unpack_batch):
images+texts fused into one [B, bytes] uint8 buffer, unpacked in-jit."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from colxlip_tpu.parallel.data_feed import DeviceFeeder, pack_batch, unpack_batch


def _batch(b=8, img_shape=(12, 16, 3), ctx=32, seed=0):
    rng = np.random.default_rng(seed)
    imgs = rng.integers(0, 256, (b,) + img_shape, np.uint8)
    txts = np.zeros((b, ctx), np.int32)
    txts[:, 0] = 49406
    txts[:, 1:5] = rng.integers(1, 49408, (b, 4))
    txts[:, 5] = 49407
    return imgs, txts


def test_pack_unpack_roundtrip():
    imgs, txts = _batch()
    buf = pack_batch(imgs, txts)
    assert buf.dtype == np.uint8
    assert buf.shape == (8, 12 * 16 * 3 + 2 * 32)
    out_i, out_t = jax.jit(
        lambda x: unpack_batch(x, (12, 16, 3), 32))(jnp.asarray(buf))
    np.testing.assert_array_equal(np.asarray(out_i), imgs)
    np.testing.assert_array_equal(np.asarray(out_t), txts)


def test_pack_roundtrip_yuv_planar_shape():
    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 256, (4, 24, 16), np.uint8)  # planar [H*3//2, W]
    txts = np.full((4, 8), 1234, np.int32)
    buf = pack_batch(imgs, txts)
    out_i, out_t = unpack_batch(jnp.asarray(buf), (24, 16), 8)
    np.testing.assert_array_equal(np.asarray(out_i), imgs)
    np.testing.assert_array_equal(np.asarray(out_t), txts)


def test_pack_rejects_non_uint8_and_big_ids():
    imgs, txts = _batch()
    with pytest.raises(ValueError):
        pack_batch(imgs.astype(np.float32), txts)
    with pytest.raises(ValueError):
        pack_batch(imgs, txts + (1 << 16))


def test_feeder_packed_returns_single_buffer():
    imgs, txts = _batch(b=4)
    feeder = DeviceFeeder(None, packed=True)
    buf, none = feeder(imgs, txts)
    assert none is None
    assert buf.shape == (4, 12 * 16 * 3 + 2 * 32)


def test_packed_step_matches_separate_step():
    """step(state, packed_buf) must produce the same metrics and params as
    step(state, images, texts) — on the 8-device mesh with the real
    data-parallel sharding."""
    from colxlip_tpu.models import CLIPCfg, ColXLIP, get_model_config
    from colxlip_tpu.parallel.mesh import create_mesh
    from colxlip_tpu.parallel.train_step import (
        TrainStepConfig,
        init_train_state,
        make_train_step,
        replicate_state,
    )
    from colxlip_tpu.training.optim import create_optimizer
    from colxlip_tpu.training.schedules import cosine_lr

    cfg = CLIPCfg.from_dict(get_model_config("ViT-S-16-test"))
    model = ColXLIP(cfg, dtype=jnp.float32)
    size = cfg.vision_cfg.image_size
    imgs, txts = _batch(b=16, img_shape=(size, size, 3), ctx=32, seed=2)
    tx = create_optimizer(cosine_lr(1e-3, 10, 100), weight_decay=0.1)
    state = init_train_state(
        model, tx, jax.random.PRNGKey(0),
        jnp.asarray(imgs[:2]), jnp.asarray(txts[:2]))

    mesh = create_mesh(8)
    scfg = TrainStepConfig(loss_type="colclip", gather_with_grad=True,
                           maxsim_impl="xla")
    step_sep = make_train_step(model, tx, scfg, mesh=mesh, donate=False)
    step_pk = make_train_step(model, tx, scfg, mesh=mesh, donate=False,
                              packed_feed=((size, size, 3), 32))

    rstate = replicate_state(state, mesh)
    s1, m1 = step_sep(rstate, jnp.asarray(imgs), jnp.asarray(txts))
    s2, m2 = step_pk(rstate, jnp.asarray(pack_batch(imgs, txts)))
    assert np.allclose(float(m1["total_loss"]), float(m2["total_loss"]),
                       rtol=1e-6)
    l1 = jax.tree.leaves(s1.params)
    l2 = jax.tree.leaves(s2.params)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

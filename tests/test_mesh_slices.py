"""Slice-aware mesh construction (colxlip_tpu/parallel/mesh.py).

Multi-slice TPU deployments (v5e-128 = 2 DCN-connected slices) need the
model axis within a slice (per-layer all-reduces on ICI) and a slice-major
data axis (data collectives cross DCN minimally) — SURVEY §2.3 backend row.
The 8 virtual CPU devices simulate 2 fake slices of 4 via ``num_slices``;
the pure ordering logic is additionally tested with stub devices carrying
real ``slice_index`` attributes.
"""
import types

import jax
import numpy as np
import pytest

from colxlip_tpu.parallel.mesh import (
    create_mesh,
    slice_major_device_array,
)


def _stubs(n, slices):
    per = n // slices
    return [types.SimpleNamespace(id=i, slice_index=i // per)
            for i in range(n)]


def test_slice_major_ordering_with_real_slice_index_attr():
    devs = _stubs(8, 2)
    arr = slice_major_device_array(devs, 2, [d.slice_index for d in devs])
    assert arr.shape == (4, 2)
    # model rows never span a slice
    for row in arr:
        assert len({d.slice_index for d in row}) == 1
    # data axis is slice-major: first half slice 0, second half slice 1
    data_slices = [row[0].slice_index for row in arr]
    assert data_slices == [0, 0, 1, 1]


def test_model_axis_spanning_dcn_is_refused():
    devs = _stubs(8, 4)  # 2 devices per slice
    with pytest.raises(ValueError, match="model_parallel"):
        slice_major_device_array(devs, 4, [d.slice_index for d in devs])


def test_unequal_slices_are_refused():
    devs = _stubs(6, 2)
    ids = [0, 0, 0, 0, 1, 1]
    with pytest.raises(ValueError, match="unequal"):
        slice_major_device_array(devs, 1, ids)


def test_num_slices_must_divide():
    with pytest.raises(ValueError, match="num_slices"):
        create_mesh(8, num_slices=3)


def test_create_mesh_virtual_two_slice_layout():
    mesh = create_mesh(8, model_parallel=2, num_slices=2)
    assert mesh.devices.shape == (4, 2)
    ids = np.vectorize(lambda d: d.id)(mesh.devices)
    # fake slices = contiguous id groups [0..3], [4..7]; every model row
    # within one group, data rows slice-major
    for row in ids:
        assert (row < 4).all() or (row >= 4).all()
    assert (ids[:2] < 4).all() and (ids[2:] >= 4).all()


def test_single_slice_reduces_to_plain_reshape():
    mesh = create_mesh(8, model_parallel=2)
    ids = np.vectorize(lambda d: d.id)(mesh.devices)
    np.testing.assert_array_equal(ids, np.arange(8).reshape(4, 2))


def test_two_slice_mesh_trains_identically(setup_models):
    """The 2-slice device order is a permutation — same math, same loss."""
    model, tx, state, images, texts = setup_models
    from colxlip_tpu.parallel.gspmd import make_train_step_gspmd, shard_state
    from colxlip_tpu.parallel.train_step import TrainStepConfig

    losses = {}
    for tag, mesh in [
        ("flat", create_mesh(8, model_parallel=2)),
        ("2slice", create_mesh(8, model_parallel=2, num_slices=2)),
    ]:
        sharded, _ = shard_state(state, mesh)
        step = make_train_step_gspmd(
            model, tx,
            TrainStepConfig(loss_type="colclip", maxsim_impl="xla",
                            gather_with_grad=True),
            mesh, donate=False,
        )
        with jax.sharding.set_mesh(mesh):
            _, metrics = step(sharded, images, texts)
        losses[tag] = float(metrics["total_loss"])
    assert losses["flat"] == pytest.approx(losses["2slice"], abs=1e-5)


@pytest.fixture(scope="module")
def setup_models():
    import jax.numpy as jnp

    from colxlip_tpu.models import CLIPCfg, ColXLIP, get_model_config
    from colxlip_tpu.parallel.train_step import init_train_state
    from colxlip_tpu.training.optim import create_optimizer
    from colxlip_tpu.training.schedules import cosine_lr

    cfg = CLIPCfg.from_dict(get_model_config("ViT-S-16-test"))
    model = ColXLIP(cfg, dtype=jnp.float32)
    tx = create_optimizer(cosine_lr(1e-3, 10, 100), weight_decay=0.1)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal((16, 64, 64, 3)).astype(np.float32))
    texts_np = np.zeros((16, 32), np.int32)
    texts_np[:, 0] = 49406
    texts_np[:, 1:4] = rng.integers(1, 40000, (16, 3))
    texts_np[:, 4] = 49407
    texts = jnp.asarray(texts_np)
    state = init_train_state(model, tx, jax.random.PRNGKey(0),
                             images[:2], texts[:2])
    return model, tx, state, images, texts

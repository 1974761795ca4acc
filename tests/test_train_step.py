"""Train-step tests: single-device, 8-device mesh parity, grad accumulation."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from colxlip_tpu.models import ColXLIP, CLIPCfg, get_model_config
from colxlip_tpu.parallel.mesh import create_mesh
from colxlip_tpu.parallel.train_step import (
    TrainState,
    TrainStepConfig,
    init_train_state,
    make_train_step,
    replicate_state,
)
from colxlip_tpu.training.optim import create_optimizer
from colxlip_tpu.training.schedules import cosine_lr

B = 16
CTX = 32


@pytest.fixture(scope="module")
def setup():
    cfg = CLIPCfg.from_dict(get_model_config("ViT-S-16-test"))
    model = ColXLIP(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    imgs = rng.standard_normal((B, 64, 64, 3)).astype(np.float32)
    txts = np.zeros((B, CTX), np.int32)
    for i in range(B):
        txts[i, 0] = 49406
        txts[i, 1:6] = 1000 + i * 7 + np.arange(5)
        txts[i, 6] = 49407
    tx = create_optimizer(cosine_lr(1e-3, 10, 100), weight_decay=0.1)
    state = init_train_state(
        model, tx, jax.random.PRNGKey(0), jnp.asarray(imgs[:2]), jnp.asarray(txts[:2])
    )
    return model, tx, state, jnp.asarray(imgs), jnp.asarray(txts)


def test_single_device_loss_decreases(setup):
    model, tx, state, imgs, txts = setup
    step = make_train_step(model, tx, TrainStepConfig(loss_type="colclip", maxsim_impl="xla"),
                           donate=False)
    losses = []
    for _ in range(5):
        state, metrics = step(state, imgs, txts)
        losses.append(float(metrics["total_loss"]))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()
    assert float(metrics["logit_scale"]) <= 100.0 + 1e-3


@pytest.mark.slow
def test_mesh_step_matches_single_device(setup):
    """shard_map step over 8 devices == single-device step on the global batch
    (gather_with_grad=True makes gradients exactly the full-batch ones)."""
    model, tx, state, imgs, txts = setup
    cfg = TrainStepConfig(loss_type="colclip", gather_with_grad=True, maxsim_impl="xla")
    step1 = make_train_step(model, tx, cfg, donate=False)
    s1, m1 = step1(state, imgs, txts)

    mesh = create_mesh(8)
    stepN = make_train_step(model, tx, cfg, mesh=mesh, donate=False)
    sN, mN = stepN(replicate_state(state, mesh), imgs, txts)

    np.testing.assert_allclose(
        float(m1["total_loss"]), float(mN["total_loss"]), rtol=1e-5
    )
    # parameters after one update must agree
    l1 = jax.tree.leaves(s1.params)
    lN = jax.tree.leaves(sN.params)
    for a, b in zip(l1, lN):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6)


@pytest.mark.slow
def test_accum_freq_one_equals_plain(setup):
    model, tx, state, imgs, txts = setup
    c1 = TrainStepConfig(loss_type="clip")
    c2 = TrainStepConfig(loss_type="clip", accum_freq=1)
    s1, m1 = make_train_step(model, tx, c1, donate=False)(state, imgs, txts)
    s2, m2 = make_train_step(model, tx, c2, donate=False)(state, imgs, txts)
    np.testing.assert_allclose(float(m1["total_loss"]), float(m2["total_loss"]), rtol=1e-6)


@pytest.mark.slow
def test_accum_freq_runs_and_decreases(setup):
    model, tx, state, imgs, txts = setup
    cfg = TrainStepConfig(loss_type="colclip", accum_freq=4, maxsim_impl="xla")
    step = make_train_step(model, tx, cfg, donate=False)
    losses = []
    for _ in range(4):
        state, metrics = step(state, imgs, txts)
        losses.append(float(metrics["total_loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


@pytest.mark.slow
def test_accum_loss_close_to_full_batch_loss(setup):
    """First-step accumulated loss must equal the full-batch loss: the spliced
    feature bank reproduces the same global batch (values identical; only
    gradient flow differs)."""
    model, tx, state, imgs, txts = setup
    m_full = make_train_step(model, tx, TrainStepConfig(loss_type="clip"), donate=False)(
        state, imgs, txts
    )[1]
    m_acc = make_train_step(
        model, tx, TrainStepConfig(loss_type="clip", accum_freq=4), donate=False
    )(state, imgs, txts)[1]
    np.testing.assert_allclose(
        float(m_full["total_loss"]), float(m_acc["total_loss"]), rtol=1e-5
    )


@pytest.mark.slow
def test_siglip_step_on_mesh(setup):
    model, tx, state, imgs, txts = setup
    mesh = create_mesh(8)
    cfg = TrainStepConfig(loss_type="siglip", dist_impl="bidir")
    step = make_train_step(model, tx, cfg, mesh=mesh, donate=False)
    sN, mN = step(replicate_state(state, mesh), imgs, txts)
    assert np.isfinite(float(mN["total_loss"]))


@pytest.mark.slow
def test_distill_train_step(setup):
    """Teacher-student distillation step: finite losses, student improves."""
    model, tx, state, imgs, txts = setup
    # teacher = a copy of the model with different params
    import copy
    teacher_params = jax.tree.map(lambda x: x * 1.01, state.params)
    cfg = TrainStepConfig(loss_type="distill")
    step = make_train_step(model, tx, cfg, donate=False,
                           teacher=(model, teacher_params))
    losses = []
    for _ in range(3):
        state, metrics = step(state, imgs, txts)
        losses.append(float(metrics["total_loss"]))
        assert np.isfinite(float(metrics["contrastive_loss"]))
        assert np.isfinite(float(metrics["distill_loss"]))
    assert losses[-1] < losses[0]


@pytest.mark.slow
def test_ring_token_dist_in_mesh_step(setup):
    """Full train step with token_dist='ring' matches the gathered variant."""
    model, tx, state, imgs, txts = setup
    mesh = create_mesh(8)
    mk = lambda td: make_train_step(
        model, tx,
        TrainStepConfig(loss_type="colclip", local_loss=True,
                        gather_with_grad=True, maxsim_impl="xla",
                        token_dist=td),
        mesh=mesh, donate=False,
    )
    s1, m1 = mk("gather")(replicate_state(state, mesh), imgs, txts)
    s2, m2 = mk("ring")(replicate_state(state, mesh), imgs, txts)
    np.testing.assert_allclose(float(m1["total_loss"]), float(m2["total_loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=3e-4, atol=3e-6)


@pytest.mark.slow
def test_valid_mask_mode_in_train_step(setup):
    """TrainStepConfig(mask_mode='valid') builds the EOT mask and trains."""
    model, tx, state, imgs, txts = setup
    cfg = TrainStepConfig(loss_type="colclip", mask_mode="valid", maxsim_impl="xla")
    step = make_train_step(model, tx, cfg, donate=False)
    losses = []
    for _ in range(3):
        state, m = step(state, imgs, txts)
        losses.append(float(m["total_loss"]))
    assert np.isfinite(losses).all() and losses[-1] < losses[0]


@pytest.mark.slow
def test_coca_with_accum(setup):
    """coca + accum_freq>1: all outputs cached/spliced (review regression)."""
    import jax as _jax
    from colxlip_tpu.models.coca import CoCa, MultimodalCfg
    from colxlip_tpu.models import CLIPCfg, get_model_config

    cfg_m = CLIPCfg.from_dict(get_model_config("ViT-S-16-test"))
    model = CoCa(cfg_m, MultimodalCfg(context_length=CTX - 1, width=128,
                                      heads=4, layers=2), dtype=jnp.float32)
    from colxlip_tpu.training.optim import create_optimizer
    tx = create_optimizer(1e-3, weight_decay=0.1)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.standard_normal((8, 64, 64, 3)).astype(np.float32))
    txts_np = np.zeros((8, CTX), np.int32)
    txts_np[:, 0] = 49406
    txts_np[:, 1:5] = rng.integers(1, 40000, (8, 4))
    txts_np[:, 5] = 49407
    txts = jnp.asarray(txts_np)
    state = init_train_state(model, tx, _jax.random.PRNGKey(0), imgs, txts)
    step = make_train_step(model, tx, TrainStepConfig(loss_type="coca", accum_freq=2),
                           donate=False)
    state, m = step(state, imgs, txts)
    assert np.isfinite(float(m["total_loss"]))


@pytest.mark.slow
def test_distill_with_accum(setup):
    """distill + accum_freq>1: teacher runs per microbatch (review regression)."""
    model, tx, state, imgs, txts = setup
    teacher_params = jax.tree.map(lambda x: x * 1.01, state.params)
    cfg = TrainStepConfig(loss_type="distill", accum_freq=2)
    step = make_train_step(model, tx, cfg, donate=False,
                           teacher=(model, teacher_params))
    state, m = step(state, imgs, txts)
    assert np.isfinite(float(m["total_loss"]))
    assert np.isfinite(float(m["distill_loss"]))


def test_locked_tower_excluded_from_opt_state_and_clip_norm():
    """optax.masked over the whole chain (reference requires_grad=False
    semantics): no Adam mu/nu allocated for the frozen tower, and frozen
    grads don't inflate the global clip norm."""
    import numpy as np
    import optax

    from colxlip_tpu.training.optim import create_optimizer

    params = {"params": {
        "visual": {"w": jnp.ones((4, 4))},
        "text": {"w": jnp.ones((4, 4))},
    }}
    tx = create_optimizer(1.0, weight_decay=0.0, grad_clip_norm=1.0,
                          lock_image=True)
    state = tx.init(params)
    # masked leaves carry MaskedNode (no mu/nu arrays) for the visual tower
    leaves_with_path = jax.tree_util.tree_leaves_with_path(
        state, is_leaf=lambda x: isinstance(x, optax.MaskedNode))
    visual_nodes = [l for p, l in leaves_with_path
                    if any("visual" in str(k) for k in p)]
    assert visual_nodes and all(
        isinstance(l, optax.MaskedNode) for l in visual_nodes)

    # huge frozen grad must not shrink the trainable update via the clip
    grads = {"params": {
        "visual": {"w": jnp.full((4, 4), 1e6)},
        "text": {"w": jnp.full((4, 4), 1e-3)},
    }}
    updates, _ = tx.update(grads, state, params)
    vis_up = np.asarray(updates["params"]["visual"]["w"])
    txt_up = np.asarray(updates["params"]["text"]["w"])
    np.testing.assert_array_equal(vis_up, 0.0)   # frozen: zero update
    assert np.abs(txt_up).max() > 1e-2           # not crushed by 1e6 norm

"""pod_shape_loss vs the REAL mesh loss: the single-chip bench shape must be
the exact per-chip math of the local_loss+ring(+neighborhood) recipe.

Assembles true per-rank banks from a global batch (the layout the collectives
produce: pooled bank = rank-major global arrays; token window slot s on rank
r = image block of rank r-s / text block of rank r+s, losses/colclip.py:73-77)
and checks the mean over ranks of pod_shape_loss equals the 8-device mesh
colclip loss — so what bench.py --pod-devices measures is the recipe's loss
graph, not an approximation of it.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from colxlip_tpu.losses import colclip_loss
from colxlip_tpu.parallel.pod_shape import (
    make_pod_banks,
    make_pod_shape_step,
    pod_shape_loss,
)

WORLD = 8
B = 2  # per-rank batch


@pytest.fixture()
def feats(rng):
    def l2n(x):
        return x / np.linalg.norm(x, axis=-1, keepdims=True)

    n = WORLD * B
    i = jnp.asarray(l2n(rng.standard_normal((n, 16)).astype(np.float32)))
    t = jnp.asarray(l2n(rng.standard_normal((n, 16)).astype(np.float32)))
    ti = jnp.asarray(l2n(rng.standard_normal((n, 5, 16)).astype(np.float32)))
    tt_np = l2n(rng.standard_normal((n, 7, 16)).astype(np.float32))
    for row, e in enumerate(rng.integers(2, 7, size=n)):
        tt_np[row, e:] = 0.0  # EOT-zeroed tails (the nonzero-mask semantics)
    tt = jnp.asarray(tt_np.astype(np.float32))
    return i, t, ti, tt


def _mesh_loss(feats, neighborhood):
    i, t, ti, tt = feats
    mesh = Mesh(np.array(jax.devices()[:WORLD]), ("data",))

    def per_device(i_, t_, ti_, tt_):
        out = colclip_loss(
            i_, t_, ti_, tt_, jnp.float32(30.0), alpha=0.6, axis_name="data",
            local_loss=True, gather_with_grad=True, maxsim_impl="xla",
            token_dist="ring", token_neighborhood=neighborhood,
        )
        return jax.lax.pmean(out["total_loss"], "data")

    return float(jax.jit(shard_map(
        per_device, mesh=mesh,
        in_specs=(P("data"), P("data"), P("data"), P("data")),
        out_specs=P(),
    ))(i, t, ti, tt))


def _rank_banks(feats, rank, k):
    """True collective banks for one rank (the ring layout)."""
    i, t, ti, tt = feats
    img_blocks = [ti[((rank - s) % WORLD) * B:((rank - s) % WORLD) * B + B]
                  for s in range(k)]
    txt_blocks = [tt[((rank + s) % WORLD) * B:((rank + s) % WORLD) * B + B]
                  for s in range(k)]
    return dict(
        all_image=i, all_text=t,
        tok_image_blocks=jnp.stack(img_blocks),
        tok_text_blocks=jnp.stack(txt_blocks),
    )


@pytest.mark.parametrize("window_mode", ["scan", "fused"])
@pytest.mark.parametrize("neighborhood", [2, 0])
def test_pod_shape_loss_matches_mesh_loss(feats, neighborhood, window_mode):
    """mean over ranks of pod_shape_loss(true banks) == mesh ring loss,
    for both the capped (K=2) and full-ring (K=0 -> 8) windows, in both
    the ring-scan and gathered-window ('fused') forms."""
    want = _mesh_loss(feats, neighborhood)
    i, t, ti, tt = feats
    k = neighborhood or WORLD
    per_rank = []
    for r in range(WORLD):
        sl = slice(r * B, (r + 1) * B)
        out = pod_shape_loss(
            i[sl], t[sl], ti[sl], tt[sl], jnp.float32(30.0),
            alpha=0.6, maxsim_impl="xla", label_offset=r * B,
            window_mode=window_mode,
            **_rank_banks(feats, r, k),
        )
        per_rank.append(float(out["total_loss"]))
    np.testing.assert_allclose(np.mean(per_rank), want, rtol=1e-5)


def test_pod_banks_shapes_and_grad_flow(feats):
    """Rolled stand-in banks: shapes match the recipe window, slot 0 is the
    local block, and gradients flow through the banks iff gather_with_grad."""
    i, t, ti, tt = feats
    out = {
        "image_features": i[:B], "text_features": t[:B],
        "token_image_features": ti[:B], "token_text_features": tt[:B],
    }
    banks = make_pod_banks(out, neighborhood=3, pod_devices=WORLD)
    assert banks["all_text"].shape == (WORLD * B, 16)
    assert banks["tok_image_blocks"].shape == (3, B, 5, 16)
    np.testing.assert_array_equal(
        np.asarray(banks["tok_image_blocks"][0]), np.asarray(ti[:B]))
    # distinct permutations per slot (no CSE-able duplicates)
    assert not np.array_equal(np.asarray(banks["tok_image_blocks"][1]),
                              np.asarray(banks["tok_image_blocks"][2]))

    def loss_via_banks(tok_img, gather_with_grad):
        o = dict(out, token_image_features=tok_img)
        b = make_pod_banks(o, neighborhood=3, pod_devices=WORLD,
                           gather_with_grad=gather_with_grad)
        # isolate the bank contribution: rows from a constant query side
        return pod_shape_loss(
            jax.lax.stop_gradient(o["image_features"]),
            jax.lax.stop_gradient(o["text_features"]),
            jax.lax.stop_gradient(o["token_image_features"]),
            jax.lax.stop_gradient(o["token_text_features"]),
            jnp.float32(30.0), maxsim_impl="xla", output_dict=False, **b)

    g_with = jax.grad(lambda x: loss_via_banks(x, True))(ti[:B])
    g_without = jax.grad(lambda x: loss_via_banks(x, False))(ti[:B])
    assert float(jnp.abs(g_with).sum()) > 0.0
    np.testing.assert_array_equal(np.asarray(g_without), 0.0)


@pytest.mark.slow
def test_pod_shape_step_trains(rng):
    """End-to-end: the jitted pod-shape step on a tiny model is finite and
    the loss falls over a few steps."""
    from colxlip_tpu.models import CLIPCfg, ColXLIP, get_model_config
    from colxlip_tpu.parallel.train_step import (
        TrainStepConfig, init_train_state)
    from colxlip_tpu.training.optim import create_optimizer
    from colxlip_tpu.training.schedules import const_lr

    cfg = CLIPCfg.from_dict(get_model_config("ViT-S-16-test"))
    model = ColXLIP(cfg, dtype=jnp.float32)
    tx = create_optimizer(const_lr(1e-3, 0), weight_decay=0.0)
    images = jnp.asarray(
        rng.standard_normal((4, 64, 64, 3)).astype(np.float32))
    texts = np.zeros((4, 32), np.int32)
    texts[:, 0] = 49406
    texts[:, 1:4] = rng.integers(1, 40000, (4, 3))
    texts[:, 4] = 49407
    texts = jnp.asarray(texts)
    state = init_train_state(model, tx, jax.random.PRNGKey(0), images, texts)
    step = make_pod_shape_step(
        model, tx,
        TrainStepConfig(loss_type="colclip", alpha=0.7, maxsim_impl="xla",
                        token_neighborhood=2, gather_with_grad=True),
        pod_devices=4, donate=False,
    )
    state, m0 = step(state, images, texts)
    losses = [float(m0["total_loss"])]
    for _ in range(5):
        state, m = step(state, images, texts)
        losses.append(float(m["total_loss"]))
    assert all(np.isfinite(losses)), losses
    assert losses[-1] < losses[0], losses

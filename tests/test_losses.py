"""Loss functions vs numpy oracles, single-device and on an 8-device CPU mesh."""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from colxlip_tpu.losses import (
    clip_loss,
    coca_loss,
    colclip_loss,
    distill_clip_loss,
    siglip_loss,
)

from oracles import (
    np_clip_loss,
    np_colclip_loss,
    np_l2norm,
    np_siglip_loss,
)

WORLD = 8


def _mesh():
    return Mesh(np.array(jax.devices()[:WORLD]), ("data",))


def _pooled(rng, n=16, d=32):
    i = np_l2norm(rng.standard_normal((n, d)).astype(np.float32))
    t = np_l2norm(rng.standard_normal((n, d)).astype(np.float32))
    return jnp.asarray(i), jnp.asarray(t)


def _tokens(rng, n=16, lt=7, li=5, d=32):
    tt = np_l2norm(rng.standard_normal((n, lt, d)).astype(np.float32))
    ti = np_l2norm(rng.standard_normal((n, li, d)).astype(np.float32))
    return jnp.asarray(ti), jnp.asarray(tt)


def test_clip_loss_single_device_matches_oracle(rng):
    i, t = _pooled(rng)
    scale = 50.0
    got = float(clip_loss(i, t, scale))
    want = np_clip_loss(np.asarray(i), np.asarray(t), scale)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_colclip_loss_single_device_matches_oracle(rng):
    i, t = _pooled(rng)
    ti, tt = _tokens(rng)
    scale, alpha = 30.0, 0.7
    out = colclip_loss(i, t, ti, tt, scale, alpha=alpha, maxsim_impl="xla")
    want_total, want_g, want_tok = np_colclip_loss(
        np.asarray(i), np.asarray(t), np.asarray(ti), np.asarray(tt), scale, alpha
    )
    np.testing.assert_allclose(float(out["total_loss"]), want_total, rtol=1e-5)
    np.testing.assert_allclose(float(out["global_contrastive_loss"]), want_g, rtol=1e-5)
    np.testing.assert_allclose(float(out["token_contrastive_loss"]), want_tok, rtol=1e-5)


def test_siglip_loss_single_device_matches_oracle(rng):
    i, t = _pooled(rng)
    scale, bias = 10.0, -2.0
    got = float(siglip_loss(i, t, scale, bias))
    want = np_siglip_loss(np.asarray(i), np.asarray(t), scale, bias)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_coca_loss_runs(rng):
    i, t = _pooled(rng, n=8)
    v, l = 50, 6
    logits = jnp.asarray(rng.standard_normal((8, l, v)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, v, (8, l)).astype(np.int32))
    out = coca_loss(i, t, logits, labels, 20.0, output_dict=True)
    assert np.isfinite(float(out["contrastive_loss"]))
    assert np.isfinite(float(out["caption_loss"]))


def test_distill_loss_runs(rng):
    i, t = _pooled(rng, n=8)
    di, dt = _pooled(rng, n=8)
    c, d = distill_clip_loss(i, t, 20.0, di, dt, 20.0)
    assert np.isfinite(float(c)) and np.isfinite(float(d))


# ---------------------------------------------------------------------------
# Distributed (8-device CPU mesh) — value parity with the single-device path.
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("local_loss", [False, True])
@pytest.mark.parametrize("gather_with_grad", [False, True])
def test_clip_loss_distributed_matches_full_batch(rng, local_loss, gather_with_grad):
    i, t = _pooled(rng, n=WORLD * 4)
    mesh = _mesh()
    scale = jnp.float32(40.0)
    per_dev = jax.jit(
        lambda a, b, s: shard_map(
            lambda a_, b_, s_: jax.lax.pmean(
                clip_loss(
                    a_, b_, s_, axis_name="data",
                    local_loss=local_loss, gather_with_grad=gather_with_grad,
                ),
                "data",
            ),
            mesh=mesh,
            in_specs=(P("data"), P("data"), P()),
            out_specs=P(),
        )(a, b, s)
    )(i, t, scale)
    want = np_clip_loss(np.asarray(i), np.asarray(t), 40.0)
    np.testing.assert_allclose(float(per_dev), want, rtol=1e-5)


@pytest.mark.parametrize("local_loss", [False, True])
def test_colclip_loss_distributed_matches_full_batch(rng, local_loss):
    n = WORLD * 2
    i, t = _pooled(rng, n=n)
    ti, tt = _tokens(rng, n=n)
    mesh = _mesh()
    alpha = 0.6

    def per_device(i_, t_, ti_, tt_, s_):
        out = colclip_loss(
            i_, t_, ti_, tt_, s_, alpha=alpha, axis_name="data",
            local_loss=local_loss, gather_with_grad=True, maxsim_impl="xla",
        )
        return jax.lax.pmean(out["total_loss"], "data")

    got = jax.jit(
        shard_map(
            per_device, mesh=mesh,
            in_specs=(P("data"), P("data"), P("data"), P("data"), P()),
            out_specs=P(),
        )
    )(i, t, ti, tt, jnp.float32(30.0))
    want, _, _ = np_colclip_loss(
        np.asarray(i), np.asarray(t), np.asarray(ti), np.asarray(tt), 30.0, alpha
    )
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


@pytest.mark.parametrize("dist_impl", ["bidir", "shift", "reduce", "gather"])
def test_siglip_distributed_all_impls_match(rng, dist_impl):
    """All four negative-exchange strategies must equal the full-batch loss sum.

    The full SigLIP loss over the global batch equals the sum over devices of
    (local positives + all cross-device negative blocks); per-device values
    differ but the psum matches the dense computation (loss.py:521-602).
    """
    n = WORLD * 2
    i, t = _pooled(rng, n=n)
    mesh = _mesh()
    scale, bias = jnp.float32(10.0), jnp.float32(-2.0)

    def per_device(i_, t_, s_, b_):
        loss = siglip_loss(
            i_, t_, s_, b_, axis_name="data", axis_size=WORLD, dist_impl=dist_impl
        )
        return jax.lax.psum(loss, "data")

    got = jax.jit(
        shard_map(
            per_device, mesh=mesh,
            in_specs=(P("data"), P("data"), P(), P()),
            out_specs=P(),
        )
    )(i, t, scale, bias)

    # dense oracle over the global batch: sum of per-block sigmoid losses,
    # normalized by the LOCAL batch size (b = n / WORLD) as the reference does
    inp, tnp = np.asarray(i), np.asarray(t)
    b = n // WORLD
    total = 0.0
    for r in range(WORLD):
        ib = inp[r * b:(r + 1) * b]
        for s in range(WORLD):
            tb = tnp[s * b:(s + 1) * b]
            logits = 10.0 * ib @ tb.T - 2.0
            labels = (2 * np.eye(b) - 1) if r == s else -np.ones((b, b))
            total += float(np.log1p(np.exp(-labels * logits)).sum() / b)
    np.testing.assert_allclose(float(got), total, rtol=1e-4)


@pytest.mark.slow
def test_clip_loss_gradients_distributed_match_full_batch(rng):
    """gather_with_grad distributed grads == single-device full-batch grads."""
    n = WORLD * 2
    i, t = _pooled(rng, n=n)
    mesh = _mesh()
    scale = jnp.float32(25.0)

    def dist_loss(i_, t_):
        def per_device(a, b):
            return jax.lax.pmean(
                clip_loss(a, b, scale, axis_name="data", gather_with_grad=True), "data"
            )
        return shard_map(
            per_device, mesh=mesh,
            in_specs=(P("data"), P("data")), out_specs=P(),
        )(i_, t_)

    g_dist = jax.grad(dist_loss, argnums=(0, 1))(i, t)
    g_full = jax.grad(lambda a, b: clip_loss(a, b, scale), argnums=(0, 1))(i, t)
    np.testing.assert_allclose(np.asarray(g_dist[0]), np.asarray(g_full[0]), rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(np.asarray(g_dist[1]), np.asarray(g_full[1]), rtol=1e-4, atol=1e-7)


@pytest.mark.parametrize("gather_with_grad", [True])
def test_colclip_ring_token_dist_matches_gather(rng, gather_with_grad):
    """Ring blockwise token loss == gathered token loss, values AND grads."""
    n = WORLD * 2
    i, t = _pooled(rng, n=n)
    ti, tt = _tokens(rng, n=n)
    mesh = _mesh()
    alpha = 0.6
    scale = jnp.float32(30.0)

    def make(token_dist):
        def per_device(i_, t_, ti_, tt_):
            out = colclip_loss(
                i_, t_, ti_, tt_, scale, alpha=alpha, axis_name="data",
                local_loss=True, gather_with_grad=gather_with_grad,
                maxsim_impl="xla", token_dist=token_dist,
            )
            return jax.lax.pmean(out["total_loss"], "data")
        return jax.jit(shard_map(
            per_device, mesh=mesh,
            in_specs=(P("data"), P("data"), P("data"), P("data")),
            out_specs=P(),
        ))

    ring = make("ring")
    gathered = make("gather")
    v_ring = float(ring(i, t, ti, tt))
    v_gather = float(gathered(i, t, ti, tt))
    np.testing.assert_allclose(v_ring, v_gather, rtol=1e-5)

    g_ring = jax.grad(lambda a, b: make("ring")(i, t, a, b))(ti, tt)
    g_gather = jax.grad(lambda a, b: make("gather")(i, t, a, b))(ti, tt)
    np.testing.assert_allclose(np.asarray(g_ring), np.asarray(g_gather),
                               rtol=1e-4, atol=1e-7)


def test_colclip_ring_respects_no_grad_gather(rng):
    """token_dist='ring' with gather_with_grad=False must match the gathered
    path's gradients (remote/gathered side carries no gradient)."""
    n = WORLD * 2
    i, t = _pooled(rng, n=n)
    ti, tt = _tokens(rng, n=n)
    mesh = _mesh()
    scale = jnp.float32(30.0)

    def make(token_dist):
        def per_device(i_, t_, ti_, tt_):
            out = colclip_loss(
                i_, t_, ti_, tt_, scale, alpha=0.6, axis_name="data",
                local_loss=True, gather_with_grad=False,
                maxsim_impl="xla", token_dist=token_dist,
            )
            return jax.lax.pmean(out["total_loss"], "data")
        return jax.jit(shard_map(
            per_device, mesh=mesh,
            in_specs=(P("data"), P("data"), P("data"), P("data")),
            out_specs=P(),
        ))

    v_ring = float(make("ring")(i, t, ti, tt))
    v_gather = float(make("gather")(i, t, ti, tt))
    np.testing.assert_allclose(v_ring, v_gather, rtol=1e-5)
    g_ring = jax.grad(lambda a, b: make("ring")(i, t, a, b), argnums=(0, 1))(ti, tt)
    g_gather = jax.grad(lambda a, b: make("gather")(i, t, a, b), argnums=(0, 1))(ti, tt)
    for a, b in zip(g_ring, g_gather):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-8)


def test_colclip_valid_mask_mode(rng):
    """mask_mode='valid' with an explicit text mask runs and differs from
    'nonzero' (padded-but-nonzero projected tokens excluded from the mean)."""
    n = 8
    i, t = _pooled(rng, n=n)
    ti, tt = _tokens(rng, n=n, lt=7)
    mask = jnp.asarray((rng.random((n, 7)) > 0.4).astype(np.float32)).at[:, 0].set(1.0)
    out_valid = colclip_loss(i, t, ti, tt, 30.0, alpha=0.5, maxsim_impl="xla",
                             mask_mode="valid", text_mask=mask)
    out_nonzero = colclip_loss(i, t, ti, tt, 30.0, alpha=0.5, maxsim_impl="xla")
    assert np.isfinite(float(out_valid["total_loss"]))
    assert abs(float(out_valid["token_contrastive_loss"])
               - float(out_nonzero["token_contrastive_loss"])) > 1e-6


def test_colclip_token_neighborhood_full_equals_ring(rng):
    """token_neighborhood == world size is exactly the full ring loss."""
    n = WORLD * 2
    i, t = _pooled(rng, n=n)
    ti, tt = _tokens(rng, n=n)
    mesh = _mesh()
    scale = jnp.float32(30.0)

    def make(neigh):
        def per_device(i_, t_, ti_, tt_):
            out = colclip_loss(
                i_, t_, ti_, tt_, scale, alpha=0.6, axis_name="data",
                local_loss=True, gather_with_grad=True, maxsim_impl="xla",
                token_dist="ring", token_neighborhood=neigh,
            )
            return jax.lax.pmean(out["total_loss"], "data")
        return jax.jit(shard_map(
            per_device, mesh=mesh,
            in_specs=(P("data"),) * 4, out_specs=P()))

    v_full = float(make(0)(i, t, ti, tt))
    v_capped = float(make(WORLD)(i, t, ti, tt))
    np.testing.assert_allclose(v_capped, v_full, rtol=1e-6)


def test_colclip_token_neighborhood_matches_reference(rng):
    """K=2 neighborhood: token CE over [own block | left-neighbor block]
    (text rows) and the symmetric pair set (image rows), positives at the
    slot-0 diagonal — verified against a direct single-device construction."""
    from colxlip_tpu.losses.clip import cross_entropy_with_integer_labels
    from colxlip_tpu.ops.maxsim import maxsim

    n = WORLD * 2
    b = n // WORLD
    i, t = _pooled(rng, n=n)
    ti, tt = _tokens(rng, n=n)
    mesh = _mesh()
    scale = jnp.float32(30.0)
    K = 2

    def per_device(i_, t_, ti_, tt_):
        out = colclip_loss(
            i_, t_, ti_, tt_, scale, alpha=0.0, axis_name="data",
            local_loss=True, gather_with_grad=True, maxsim_impl="xla",
            token_dist="ring", token_neighborhood=K,
        )
        return jax.lax.pmean(out["token_contrastive_loss"], "data")

    got = float(jax.jit(shard_map(
        per_device, mesh=mesh, in_specs=(P("data"),) * 4, out_specs=P()))(
        i, t, ti, tt))

    # reference: per rank r, text rows vs images {r, r-1}; image rows vs
    # texts {r, r+1}; labels = arange(b) (slot-0 diagonal)
    labels = jnp.arange(b)
    per_rank = []
    for r in range(WORLD):
        sl = slice(r * b, (r + 1) * b)
        left = slice(((r - 1) % WORLD) * b, ((r - 1) % WORLD) * b + b)
        right = slice(((r + 1) % WORLD) * b, ((r + 1) % WORLD) * b + b)
        s_text = maxsim(tt[sl], jnp.concatenate([ti[sl], ti[left]]),
                        impl="xla")
        s_image = maxsim(jnp.concatenate([tt[sl], tt[right]]), ti[sl],
                         impl="xla").T
        ce = (cross_entropy_with_integer_labels(scale * s_image, labels)
              + cross_entropy_with_integer_labels(scale * s_text, labels)) / 2
        per_rank.append(float(ce))
    np.testing.assert_allclose(got, np.mean(per_rank), rtol=1e-5)


def test_colclip_token_neighborhood_requires_ring(rng):
    i, t = _pooled(rng, n=8)
    ti, tt = _tokens(rng, n=8)
    with pytest.raises(ValueError, match="token_neighborhood"):
        colclip_loss(i, t, ti, tt, jnp.float32(10.0), axis_name="data",
                     local_loss=True, token_dist="gather",
                     token_neighborhood=2)

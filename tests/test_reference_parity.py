"""Parity against the reference's OWN EXECUTED code (not a reimplementation).

Loads /root/reference/src/colxlip/loss.py and train.py read-only via
importlib (loss.py imports standalone; train.py needs sys.modules stubs for
the installed open_clip/open_clip_train surface it expects) and asserts this
repo's losses and retrieval metrics match the reference functions run on the
same random tensors. This closes the oracle-circularity gap: every other
parity test checks against oracles we wrote from reading the reference
(tests/oracles.py, tests/torch_oracle.py); these check against the reference
itself.

Multi-device forms are covered transitively: tests/test_losses.py and
tests/test_grad_parity.py pin 8-device value/grad == single-device value, and
the single-device value is pinned here against the reference's executed
world_size==1 branch (its world_size>1 branches need NCCL process groups that
cannot run in this container).

Reference functions executed: compute_colbert_similarity (loss.py:20-46),
ClipLoss (loss.py:95-182), ColClipLoss (loss.py:184-296), CoCaLoss
(loss.py:298-340), DistillClipLoss (loss.py:343-379), SigLipLoss
(loss.py:470-604, world_size==1), compute_retrieval (train.py:457-508).
"""
import importlib.util
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference/src/colxlip"


def _load_module(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_loss():
    if not os.path.exists(f"{REF}/loss.py"):
        pytest.skip("reference tree not mounted")
    return _load_module("ref_colxlip_loss", f"{REF}/loss.py")


@pytest.fixture(scope="module")
def ref_train():
    if not os.path.exists(f"{REF}/train.py"):
        pytest.skip("reference tree not mounted")
    # stub the installed packages the reference imports at module scope;
    # none of the stubbed symbols participate in compute_retrieval
    stubs = {}
    oc = types.ModuleType("open_clip")
    oc.get_input_dtype = lambda *a, **k: torch.float32
    stubs["open_clip"] = oc
    oct_ = types.ModuleType("open_clip_train")
    for sub, attrs in {
        "distributed": {"is_master": lambda args: True},
        "zero_shot": {"zero_shot_eval": lambda *a, **k: {}},
        "precision": {"get_autocast": lambda *a, **k: None},
    }.items():
        m = types.ModuleType(f"open_clip_train.{sub}")
        for k, v in attrs.items():
            setattr(m, k, v)
        stubs[f"open_clip_train.{sub}"] = m
        setattr(oct_, sub, m)
    stubs["open_clip_train"] = oct_
    saved = {k: sys.modules.get(k) for k in stubs}
    sys.modules.update(stubs)
    try:
        yield _load_module("ref_colxlip_train", f"{REF}/train.py")
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


def _l2n(x, axis=-1):
    return x / np.maximum(np.linalg.norm(x, axis=axis, keepdims=True), 1e-12)


def _features(seed=0, b=6, d=16, lt=9, li=5):
    """Random normalized global + token features with reference-shaped text
    token zeroing (tokens at/after EOT are exactly zero — the property the
    masked-mean semantics depend on)."""
    rng = np.random.default_rng(seed)
    img = _l2n(rng.standard_normal((b, d)).astype(np.float32))
    txt = _l2n(rng.standard_normal((b, d)).astype(np.float32))
    tok_img = _l2n(rng.standard_normal((b, li, d)).astype(np.float32))
    tok_txt = _l2n(rng.standard_normal((b, lt, d)).astype(np.float32))
    eot = rng.integers(2, lt, size=b)  # >=2 tokens survive per caption
    for i, e in enumerate(eot):
        tok_txt[i, e:] = 0.0
    return img, txt, tok_img, tok_txt


def test_maxsim_matches_reference_executed(ref_loss):
    import jax.numpy as jnp

    from colxlip_tpu.ops.maxsim import maxsim

    _, _, tok_img, tok_txt = _features(seed=1)
    ref = ref_loss.compute_colbert_similarity(
        torch.from_numpy(tok_img), torch.from_numpy(tok_txt)).numpy()
    ours = np.asarray(maxsim(jnp.asarray(tok_txt), jnp.asarray(tok_img),
                             mask_mode="nonzero", impl="xla"))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)
    # streaming custom-VJP path (the production impl) too
    ours_s = np.asarray(maxsim(jnp.asarray(tok_txt), jnp.asarray(tok_img),
                               mask_mode="nonzero", impl="streaming"))
    np.testing.assert_allclose(ours_s, ref, rtol=1e-5, atol=1e-6)


def test_clip_loss_matches_reference_executed(ref_loss):
    import jax.numpy as jnp

    from colxlip_tpu.losses.clip import clip_loss

    img, txt, _, _ = _features(seed=2)
    scale = 47.3
    ref = ref_loss.ClipLoss()(
        image_features=torch.from_numpy(img),
        text_features=torch.from_numpy(txt),
        logit_scale=torch.tensor(scale),
    ).item()
    ours = float(clip_loss(jnp.asarray(img), jnp.asarray(txt),
                           jnp.asarray(scale)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_colclip_loss_matches_reference_executed(ref_loss):
    import jax.numpy as jnp

    from colxlip_tpu.losses.colclip import colclip_loss

    img, txt, tok_img, tok_txt = _features(seed=3)
    scale, alpha = 31.1, 0.7
    ref = ref_loss.ColClipLoss(alpha=alpha)(
        image_features=torch.from_numpy(img),
        text_features=torch.from_numpy(txt),
        token_image_features=torch.from_numpy(tok_img),
        token_text_features=torch.from_numpy(tok_txt),
        logit_scale=torch.tensor(scale),
        output_dict=True,
    )
    ours = colclip_loss(
        jnp.asarray(img), jnp.asarray(txt), jnp.asarray(tok_img),
        jnp.asarray(tok_txt), jnp.asarray(scale), alpha=alpha,
        maxsim_impl="xla", output_dict=True,
    )
    for key in ("global_contrastive_loss", "token_contrastive_loss",
                "total_loss"):
        np.testing.assert_allclose(
            float(ours[key]), ref[key].item(), rtol=1e-5,
            err_msg=f"mismatch on {key}")


def test_siglip_loss_matches_reference_executed(ref_loss):
    import jax.numpy as jnp

    from colxlip_tpu.losses.siglip import siglip_loss

    img, txt, _, _ = _features(seed=4)
    scale, bias = 11.7, -8.3
    ref = ref_loss.SigLipLoss()(
        image_features=torch.from_numpy(img),
        text_features=torch.from_numpy(txt),
        logit_scale=torch.tensor(scale),
        logit_bias=torch.tensor(bias),
    ).item()
    ours = float(siglip_loss(jnp.asarray(img), jnp.asarray(txt),
                             jnp.asarray(scale), jnp.asarray(bias)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_coca_loss_matches_reference_executed(ref_loss):
    import jax.numpy as jnp

    from colxlip_tpu.losses.coca import coca_loss

    img, txt, _, _ = _features(seed=5)
    rng = np.random.default_rng(55)
    b, l, v = img.shape[0], 7, 37
    logits = rng.standard_normal((b, l, v)).astype(np.float32)
    labels = rng.integers(0, v, size=(b, l))
    labels[:, -2:] = 0  # pad tail exercises ignore_index
    ref_clip, ref_cap = ref_loss.CoCaLoss(
        caption_loss_weight=2.0, clip_loss_weight=1.0, pad_id=0)(
        image_features=torch.from_numpy(img),
        text_features=torch.from_numpy(txt),
        logits=torch.from_numpy(logits),
        labels=torch.from_numpy(labels),
        logit_scale=torch.tensor(29.9),
    )
    ours_clip, ours_cap = coca_loss(
        jnp.asarray(img), jnp.asarray(txt), jnp.asarray(logits),
        jnp.asarray(labels), jnp.asarray(29.9),
        caption_loss_weight=2.0, clip_loss_weight=1.0, pad_id=0,
    )
    np.testing.assert_allclose(float(ours_clip), ref_clip.item(), rtol=1e-5)
    np.testing.assert_allclose(float(ours_cap), ref_cap.item(), rtol=1e-5)


def test_distill_loss_matches_reference_executed(ref_loss):
    import jax.numpy as jnp

    from colxlip_tpu.losses.distill import distill_clip_loss

    img, txt, _, _ = _features(seed=6)
    t_img, t_txt, _, _ = _features(seed=7)
    ref_con, ref_dist = ref_loss.DistillClipLoss()(
        image_features=torch.from_numpy(img),
        text_features=torch.from_numpy(txt),
        logit_scale=torch.tensor(19.0),
        dist_image_features=torch.from_numpy(t_img),
        dist_text_features=torch.from_numpy(t_txt),
        dist_logit_scale=torch.tensor(41.0),
    )
    ours_con, ours_dist = distill_clip_loss(
        jnp.asarray(img), jnp.asarray(txt), jnp.asarray(19.0),
        jnp.asarray(t_img), jnp.asarray(t_txt), jnp.asarray(41.0),
    )
    np.testing.assert_allclose(float(ours_con), ref_con.item(), rtol=1e-5)
    np.testing.assert_allclose(float(ours_dist), ref_dist.item(), rtol=1e-5)


def test_compute_retrieval_matches_reference_executed(ref_train):
    from colxlip_tpu.training.evaluate import compute_retrieval_metrics

    rng = np.random.default_rng(8)
    n_img, n_txt = 12, 30
    i2t = rng.standard_normal((n_img, n_txt)).astype(np.float32)
    # ground truth: each image owns 2-3 captions, each caption one image
    img2txt, txt2img, cap = {}, {}, 0
    for i in range(n_img):
        k = 2 + (i % 2)
        img2txt[i] = list(range(cap, min(cap + k, n_txt)))
        for c in img2txt[i]:
            txt2img[c] = i
        cap += k
    # reference wants every caption id mapped; trim to assigned captions
    n_txt = cap if cap < n_txt else n_txt
    i2t = i2t[:, :n_txt]
    img2txt = {i: [c for c in v if c < n_txt] for i, v in img2txt.items()}

    ref = ref_train.compute_retrieval(
        torch.from_numpy(i2t), txt2img, img2txt)
    ours = compute_retrieval_metrics(i2t, txt2img, img2txt)
    assert set(ref) == set(ours)
    for k in ref:
        np.testing.assert_allclose(ours[k], float(ref[k]), rtol=1e-6,
                                   err_msg=f"mismatch on {k}")

"""Pure-numpy oracles replicating the reference's documented loss math.

Written fresh from the behavior documented in SURVEY.md / the reference's
loss.py semantics (cited per function) — these are the ground truth that the
jax/pallas implementations are property-tested against (SURVEY.md §4, §7.3).
"""
import numpy as np


def np_colbert_similarity(token_text, token_image, mask_mode="nonzero", text_mask=None):
    """reference loss.py:20-46 ('nonzero') / model.py:611-629 ('plain')."""
    m, lt, d = token_text.shape
    k, li, _ = token_image.shape
    sim = np.einsum("mnd,kqd->mknq", token_text, token_image)
    max_sim = sim.max(axis=3)  # [m, k, lt]
    if mask_mode == "nonzero":
        w = (max_sim != 0).astype(np.float64)
        return max_sim.sum(axis=2) / (w.sum(axis=2) + 1e-8)
    if mask_mode == "plain":
        return max_sim.mean(axis=2)
    if mask_mode == "valid":
        w = np.broadcast_to(text_mask[:, None, :], max_sim.shape).astype(np.float64)
        return (max_sim * w).sum(axis=2) / (w.sum(axis=2) + 1e-8)
    raise ValueError(mask_mode)


def np_softmax_ce(logits, labels):
    """torch F.cross_entropy (mean reduction) equivalent."""
    logits = logits.astype(np.float64)
    logits = logits - logits.max(axis=1, keepdims=True)
    lse = np.log(np.exp(logits).sum(axis=1))
    true = logits[np.arange(len(labels)), labels]
    return float((lse - true).mean())


def np_clip_loss(image_features, text_features, scale):
    """reference loss.py:150-181, single-process branch."""
    logits_per_image = scale * image_features @ text_features.T
    logits_per_text = logits_per_image.T
    labels = np.arange(len(image_features))
    return (np_softmax_ce(logits_per_image, labels) + np_softmax_ce(logits_per_text, labels)) / 2


def np_colclip_loss(img_f, txt_f, tok_img, tok_txt, scale, alpha):
    """reference loss.py:258-294, single-process branch."""
    labels = np.arange(len(img_f))
    lpi = scale * img_f @ txt_f.T
    g = (np_softmax_ce(lpi, labels) + np_softmax_ce(lpi.T, labels)) / 2
    s = scale * np_colbert_similarity(tok_txt, tok_img)
    t = (np_softmax_ce(s.T, labels) + np_softmax_ce(s, labels)) / 2
    return alpha * g + (1 - alpha) * t, g, t


def np_siglip_loss(image_features, text_features, scale, bias):
    """reference loss.py:498-519 (single device: positives + in-batch negs)."""
    logits = scale * image_features @ text_features.T + bias
    b = len(image_features)
    labels = 2 * np.eye(b) - np.ones((b, b))
    return float(np.log1p(np.exp(-labels * logits)).sum() / b)


def np_l2norm(x, axis=-1):
    return x / np.maximum(np.linalg.norm(x, axis=axis, keepdims=True), 1e-12)


def np_eot_mask_tokens(token_features, text_ids):
    """reference model.py:581-593: zero token features at/after argmax(EOT)."""
    eot = text_ids.argmax(axis=-1)
    pos = np.arange(text_ids.shape[1])[None, :]
    keep = pos < eot[:, None]
    return np.where(keep[:, :, None], token_features, 0.0)

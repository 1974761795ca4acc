"""Minimal usage example (counterpart of reference src/minimal_example.py).

Loads a ColXLIP model (pretrained checkpoint optional), scores a few captions
against one image, and compares late-interaction vs plain-CLIP scoring — the
comparison the reference demo ran on FLAIR weights.

Run:  PYTHONPATH=. python examples/minimal_example.py [checkpoint.pt]
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

from colxlip_tpu import create_model_and_transforms, get_tokenizer

MODEL = "ViT-B-32-colxlip"

pretrained = sys.argv[1] if len(sys.argv) > 1 else None
model, cfg, params, _, preprocess_val = create_model_and_transforms(
    MODEL, pretrained=pretrained, precision="fp32"
)
tokenizer = get_tokenizer(MODEL)

# one synthetic "image" (drop in a real file with PIL.Image.open + preprocess_val)
rng = np.random.default_rng(0)
image = jnp.asarray(rng.standard_normal((1, 224, 224, 3)).astype(np.float32))

captions = [
    "a photo of a cat",
    "a photo of a dog",
    "a city street at night with neon lights",
    "a bowl of fresh fruit on a wooden table",
]
texts = jnp.asarray(tokenizer(captions))

logits, _ = model.apply(
    params, image, texts, method=lambda m, i, t: m.get_logits(i, t)
)
clip_logits, _ = model.apply(
    params, image, texts, method=lambda m, i, t: m.get_logits_as_clip(i, t)
)

print("late-interaction probs:", np.asarray(jax.nn.softmax(logits, axis=-1))[0])
print("plain-CLIP probs:      ", np.asarray(jax.nn.softmax(clip_logits, axis=-1))[0])

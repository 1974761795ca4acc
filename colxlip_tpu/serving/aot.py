"""AOT-compiled model artifacts via ``jax.export`` — the TPU-native analog
of the reference's ``--torchscript`` trace hook (reference main.py:233,
model.py:339-352).

The reference's torchscript path traces the towers into a self-contained
module that runs without the Python model definition. The XLA-native
equivalent is *ahead-of-time lowering*: ``jax.export`` serializes the
StableHLO of the jitted tower functions with the trained weights baked in
as module constants. The resulting bundle deserializes and runs with only
``jax`` installed — no model registry, config JSON, flax module tree, or
checkpoint files — and improves on the torch artifact in two TPU-relevant
ways:

  - **Symbolic batch dimension.** The towers are exported with a symbolic
    leading dim (``jax.export.symbolic_shape``), so ONE artifact serves any
    batch size; XLA re-specializes per concrete shape at call time (cached).
    A ``static_batch`` can be pinned instead for a single-program serving
    deployment.
  - **Multi-platform lowering.** ``platforms=("cpu", "tpu")`` lowers one
    module that runs on either backend: export on a CPU build host, serve
    on TPU (torchscript artifacts are retraced per backend).

Serialization is versioned by jax.export's calling-convention gate, so a
too-old runtime fails loudly instead of mis-executing.

Bundle layout (a directory):

    meta.json           model name, embed_dim, context/image sizes,
                        logit_scale, dtypes, output field names
    encode_text.jaxexp  serialized Exported: tokens[int32 b,L] ->
                        (pooled[b,D], token_feats[b,L',D]?) — l2-normalized
    encode_image.jaxexp serialized Exported: images[f32/u8 b,H,W,3] ->
                        (pooled[b,D], token_feats[b,N,D]?)
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, Optional, Tuple

import numpy as np

META_NAME = "meta.json"
_SUFFIX = ".jaxexp"

# text padding that keeps the argmax-EOT pool well-defined on pad rows
SOT, EOT = 49406, 49407


def _tower_fns(model, params):
    """(encode_text, encode_image) closures returning tuples; params are
    captured, so jax.export bakes them into the module as constants."""

    def encode_text(texts):
        out = model.apply(
            params, text=texts,
            method=lambda m, text: m.encode_text(text, normalize=True))
        return out if isinstance(out, tuple) else (out,)

    def encode_image(images):
        out = model.apply(
            params, images,
            method=lambda m, image: m.encode_image(image, normalize=True))
        return out if isinstance(out, tuple) else (out,)

    return encode_text, encode_image


def export_towers(model, params, cfg, *,
                  platforms: Tuple[str, ...] = ("cpu", "tpu"),
                  static_batch: Optional[int] = None,
                  uint8_images: bool = False) -> Dict[str, "object"]:
    """Lower both towers to ``jax.export.Exported`` objects.

    ``static_batch=None`` exports a symbolic batch dim (one artifact, any
    batch size); an int pins the shape. ``uint8_images=True`` exports the
    image entry with a uint8 input — the tower normalizes integer input on
    device (models/configs.py image_mean/std), which quarters host->device
    transfer for serving.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    if static_batch is None:
        b, = jexport.symbolic_shape("b")
    else:
        if static_batch < 1:
            raise ValueError(f"static_batch must be >= 1, got {static_batch}")
        b = static_batch
    ctx = cfg.text_cfg.context_length
    s = cfg.vision_cfg.image_size
    h, w = (s, s) if isinstance(s, int) else tuple(s)
    img_dtype = jnp.uint8 if uint8_images else jnp.float32

    encode_text, encode_image = _tower_fns(model, params)
    exp = {}
    exp["encode_text"] = jexport.export(
        jax.jit(encode_text), platforms=platforms)(
            jax.ShapeDtypeStruct((b, ctx), jnp.int32))
    exp["encode_image"] = jexport.export(
        jax.jit(encode_image), platforms=platforms)(
            jax.ShapeDtypeStruct((b, h, w, 3), img_dtype))
    return exp


def save_aot_bundle(out_dir: str, model, params, cfg, *,
                    model_name: str = "",
                    platforms: Tuple[str, ...] = ("cpu", "tpu"),
                    static_batch: Optional[int] = None,
                    uint8_images: bool = False) -> dict:
    """Export both towers and write the bundle directory. Returns meta."""
    exported = export_towers(
        model, params, cfg, platforms=platforms,
        static_batch=static_batch, uint8_images=uint8_images)
    os.makedirs(out_dir, exist_ok=True)
    sizes = {}
    for name, exp in exported.items():
        data = exp.serialize()
        with open(os.path.join(out_dir, name + _SUFFIX), "wb") as f:
            f.write(data)
        sizes[name] = len(data)
    ls = np.asarray(params["params"]["logit_scale"])
    s = cfg.vision_cfg.image_size
    h, w = (s, s) if isinstance(s, int) else tuple(s)
    n_out = len(exported["encode_text"].out_avals)
    meta = {
        "format": "colxlip-aot-v1",
        "model": model_name,
        "embed_dim": cfg.embed_dim,
        "context_length": cfg.text_cfg.context_length,
        "image_size": [h, w],
        "image_dtype": "uint8" if uint8_images else "float32",
        "logit_scale": float(np.exp(ls)),
        "platforms": list(platforms),
        "static_batch": static_batch,
        "outputs": ["pooled", "token_features"][:n_out] or ["pooled"],
        "bytes": sizes,
    }
    with open(os.path.join(out_dir, META_NAME), "w") as f:
        json.dump(meta, f, indent=1)
    return meta


@dataclasses.dataclass
class AotModel:
    """A deserialized AOT bundle. ``encode_text`` / ``encode_image`` mirror
    the live-model surface (tuple of (pooled, token_features?) arrays),
    ``meta`` carries everything scoring needs (embed_dim, logit_scale)."""
    meta: dict
    _text: "object"
    _image: "object"

    @property
    def logit_scale(self) -> float:
        return float(self.meta["logit_scale"])

    def encode_text(self, tokens: np.ndarray) -> Tuple:
        tokens = np.asarray(tokens, np.int32)
        if tokens.ndim != 2 or tokens.shape[1] != self.meta["context_length"]:
            raise ValueError(
                f"tokens must be [b, {self.meta['context_length']}] int32, "
                f"got {tokens.shape}")
        return tuple(self._text.call(tokens))

    def encode_image(self, images: np.ndarray) -> Tuple:
        want = np.uint8 if self.meta["image_dtype"] == "uint8" else np.float32
        images = np.asarray(images, want)
        h, w = self.meta["image_size"]
        if images.ndim != 4 or images.shape[1:] != (h, w, 3):
            raise ValueError(
                f"images must be [b, {h}, {w}, 3] {want.__name__}, "
                f"got {images.shape}")
        return tuple(self._image.call(images))


def load_aot_bundle(path: str) -> AotModel:
    """Deserialize a bundle directory written by ``save_aot_bundle``.

    Needs only jax — no model definition or checkpoint. Raises a clear
    error when the running backend is not among the bundle's lowered
    platforms.
    """
    import jax
    from jax import export as jexport

    with open(os.path.join(path, META_NAME)) as f:
        meta = json.load(f)
    if meta.get("format") != "colxlip-aot-v1":
        raise ValueError(f"{path}: not a colxlip AOT bundle "
                         f"(format={meta.get('format')!r})")
    backend = jax.default_backend()
    if backend not in meta["platforms"]:
        raise ValueError(
            f"bundle was lowered for {meta['platforms']} but the running "
            f"backend is {backend!r} — re-export with platforms="
            f"(..., {backend!r})")
    exps = {}
    for name in ("encode_text", "encode_image"):
        with open(os.path.join(path, name + _SUFFIX), "rb") as f:
            exps[name] = jexport.deserialize(f.read())
    return AotModel(meta=meta, _text=exps["encode_text"],
                    _image=exps["encode_image"])

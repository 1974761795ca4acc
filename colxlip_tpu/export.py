"""Model export for serving: StableHLO serialization of jitted entry points.

TPU-native replacement for the reference's ``--torchscript`` /
``trace_model`` deployment path (reference main.py:233, model.py:339-352):
``jax.export`` serializes the compiled computation (StableHLO) so a serving
runtime can execute the towers without the Python model definition.
"""
from __future__ import annotations

import logging
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

logger = logging.getLogger(__name__)


def export_encoders(
    model,
    params,
    out_dir: str,
    *,
    image_size: Tuple[int, int] = (224, 224),
    context_length: int = 77,
    batch_size: Optional[int] = None,
) -> dict:
    """Serialize encode_image / encode_text to ``out_dir/*.stablehlo``.

    batch_size=None exports with a symbolic batch dimension.
    """
    from jax import export as jx

    os.makedirs(out_dir, exist_ok=True)
    if batch_size is None:
        (b,) = jx.symbolic_shape("b")
    else:
        b = batch_size
    h, w = image_size

    def encode_image(params, images):
        return model.apply(
            params, images,
            method=lambda m, image: m.encode_image(image, normalize=True),
        )

    def encode_text(params, texts):
        return model.apply(
            params, text=texts,
            method=lambda m, text: m.encode_text(text, normalize=True),
        )

    img_spec = jax.ShapeDtypeStruct((b, h, w, 3), jnp.float32)
    txt_spec = jax.ShapeDtypeStruct((b, context_length), jnp.int32)
    param_specs = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), params
    )

    paths = {}
    for name, fn, spec in (
        ("encode_image", encode_image, img_spec),
        ("encode_text", encode_text, txt_spec),
    ):
        exported = jx.export(jax.jit(fn))(param_specs, spec)
        blob = exported.serialize()
        path = os.path.join(out_dir, f"{name}.stablehlo")
        with open(path, "wb") as f:
            f.write(blob)
        logger.info("exported %s (%d bytes) -> %s", name, len(blob), path)
        paths[name] = path
    return paths


def load_exported(path: str):
    """Deserialize an exported function; call via ``.call(params, batch)``."""
    from jax import export as jx

    with open(path, "rb") as f:
        return jx.deserialize(f.read())

"""StableHLO export/reload round trip."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from colxlip_tpu.export import export_encoders, load_exported
from colxlip_tpu.models import ColXLIP, CLIPCfg, get_model_config


def test_export_roundtrip(tmp_path):
    cfg = CLIPCfg.from_dict(get_model_config("ViT-S-16-test"))
    model = ColXLIP(cfg, dtype=jnp.float32)
    img = jnp.ones((2, 64, 64, 3)) * 0.1
    txt = jnp.zeros((2, 32), jnp.int32).at[:, 0].set(49406).at[:, 5].set(49407)
    params = model.init(jax.random.PRNGKey(0), img, txt)

    paths = export_encoders(
        model, params, str(tmp_path), image_size=(64, 64),
        context_length=32, batch_size=2,
    )
    reloaded = load_exported(paths["encode_image"])
    pooled, tokens = reloaded.call(params, img)
    want_pooled, want_tokens = model.apply(
        params, img, method=lambda m, image: m.encode_image(image, normalize=True)
    )
    np.testing.assert_allclose(np.asarray(pooled), np.asarray(want_pooled), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(tokens), np.asarray(want_tokens), rtol=1e-4, atol=1e-6)

    reloaded_t = load_exported(paths["encode_text"])
    pt, _ = reloaded_t.call(params, txt)
    wt, _ = model.apply(params, text=txt,
                        method=lambda m, text: m.encode_text(text, normalize=True))
    np.testing.assert_allclose(np.asarray(pt), np.asarray(wt), rtol=1e-4, atol=1e-6)

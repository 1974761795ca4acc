"""--text-ctx: train-time data-side text-context override.

The reference always computes the fixed 77-token context (reference
transformer.py:863) though web captions are far shorter
(scripts/caption_length_stats.py). The override shrinks the tokenizer
output + batch shape only; model params stay at the config's context (the
text tower slices positional_embedding[:n]), so checkpoints and every eval
path are unchanged.
"""
import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from colxlip_tpu.main import main
from colxlip_tpu.models import CLIPCfg, ColXLIP, get_model_config


def test_short_context_forward_matches_padded():
    """Feeding [B, n] tokens (n < config context) must equal feeding the
    same tokens zero-padded to the full context: pos-embed slice + causal
    mask + EOT-argmax pooling are all prefix-stable, and the EOT-zeroed
    token features past n are zeros that the masked-mean ignores."""
    cfg = CLIPCfg.from_dict(get_model_config("ViT-S-16-test"))
    model = ColXLIP(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    b, n, full = 4, 16, cfg.text_cfg.context_length
    imgs = jnp.asarray(rng.standard_normal(
        (b, cfg.vision_cfg.image_size, cfg.vision_cfg.image_size, 3)
    ).astype(np.float32))
    short = np.zeros((b, n), np.int32)
    short[:, 0] = 49406
    short[:, 1:6] = rng.integers(1, 49000, (b, 5))
    short[:, 6] = 49407
    padded = np.zeros((b, full), np.int32)
    padded[:, :n] = short

    import jax
    params = model.init(jax.random.PRNGKey(0), imgs[:2],
                        jnp.asarray(padded[:2]))
    out_s = model.apply(params, imgs, jnp.asarray(short))
    out_p = model.apply(params, imgs, jnp.asarray(padded))
    np.testing.assert_allclose(np.asarray(out_s["text_features"]),
                               np.asarray(out_p["text_features"]),
                               rtol=0, atol=1e-5)
    # token features agree on the computed prefix; the padded tail is
    # EOT-zeroed so it cannot influence the masked-mean MaxSim loss
    np.testing.assert_allclose(
        np.asarray(out_s["token_text_features"]),
        np.asarray(out_p["token_text_features"])[:, :n],
        rtol=0, atol=1e-5)
    assert np.all(np.asarray(out_p["token_text_features"])[:, n:] == 0)


def test_text_ctx_rejects_out_of_range(tmp_path):
    argv = ["--model", "ViT-S-16-test", "--dataset-type", "synthetic",
            "--logs", str(tmp_path), "--name", "ctxbad",
            "--text-ctx", "99"]
    assert main(argv) == 1


@pytest.mark.slow
def test_main_text_ctx_trains(tmp_path):
    logs = str(tmp_path / "logs")
    argv = [
        "--model", "ViT-S-16-test",
        "--dataset-type", "synthetic",
        "--train-num-samples", "32",
        "--batch-size", "2",
        "--epochs", "1",
        "--lr", "1e-3",
        "--precision", "fp32",
        "--logs", logs,
        "--name", "ctx16",
        "--workers", "0",
        "--save-frequency", "0",
        "--maxsim-impl", "xla",
        "--text-ctx", "16",
        "--seed", "0",
    ]
    assert main(argv) == 0
    metrics_path = os.path.join(logs, "ctx16", "metrics.jsonl")
    records = [json.loads(l) for l in open(metrics_path)]
    assert records and all(np.isfinite(r["total_loss"]) for r in records)

"""End-to-end verify drive (.claude/skills/verify recipe step 2).

Run on the real chip after any models/ops/losses change:

    PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/verify_drive.py

Checks, in order: (1) on-chip parity of the fused-attention kernel and its
A/B emission-order variant against the XLA reference; (2) a 150-step tiny
train through the public API (ColXLIP + colclip_loss + adamw) on 16
synthetic correlated pairs — loss must fall well below ln(16)≈2.77 and t2i
R@1 must beat chance via BOTH global features and MaxSim scoring.
Round-4 observed: loss 2.91→2.10, R@1 global 0.250 / maxsim 0.375 vs
0.0625 chance. Budget ~10 min uncached (remote compiles), ~2 min cached.
"""
import os
import sys
from functools import partial

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

print("devices:", jax.devices())

# ---- Part 1: on-chip parity of the pipe-order kernel variant ----
from colxlip_tpu.ops.fused_attention import (
    fused_mha_packed, fused_mha_reference,
)

rng = np.random.default_rng(0)
qkv = jnp.asarray(
    rng.standard_normal((8, 197, 3 * 768)).astype(np.float32),
    dtype=jnp.bfloat16)
ref = np.asarray(fused_mha_reference(qkv, 12, False), dtype=np.float32)
os.environ["COLXLIP_ATTN_ORDER"] = "pipe"
out_pipe = np.asarray(fused_mha_packed(qkv, 12, False), dtype=np.float32)
os.environ["COLXLIP_ATTN_ORDER"] = "head"
out_head = np.asarray(fused_mha_packed(qkv, 12, False), dtype=np.float32)
err_pipe = np.max(np.abs(out_pipe - ref))
err_head = np.max(np.abs(out_head - ref))
print(f"on-chip parity: pipe max|err|={err_pipe:.2e} head={err_head:.2e}")
assert err_pipe < 2e-2 and err_head < 2e-2, "on-chip parity FAILED"

# ---- Part 2: tiny e2e train drive (recipe step 2) ----
import optax

from colxlip_tpu.losses.colclip import colclip_loss
from colxlip_tpu.models import CLIPCfg, ColXLIP, get_model_config
from colxlip_tpu.ops.maxsim import maxsim

cfg = CLIPCfg.from_dict(get_model_config("ViT-S-16-test"))
model = ColXLIP(cfg, dtype=jnp.bfloat16)

n = 16
images_np = rng.standard_normal((n, cfg.vision_cfg.image_size,
                                 cfg.vision_cfg.image_size, 3)) * 0.2
cls = np.arange(n)
images_np += cls[:, None, None, None] * 0.15  # class-dependent means
images = jnp.asarray(images_np.astype(np.float32))
texts_np = np.zeros((n, cfg.text_cfg.context_length), np.int32)
texts_np[:, 0] = 49406
for i in range(n):
    texts_np[i, 1:6] = 100 + 7 * i + np.arange(5)
    texts_np[i, 6] = 49407
texts = jnp.asarray(texts_np)

params = model.init(jax.random.PRNGKey(0), images[:2], texts[:2])
tx = optax.adamw(1e-3, weight_decay=0.01)
opt_state = tx.init(params)


# donate params/opt_state: buffer reuse keeps the in-flight queue from
# accumulating param copies (the HBM-OOM trap CLAUDE.md flags) if this
# script is ever reused with a larger config
@partial(jax.jit, donate_argnums=(0, 1))
def step(params, opt_state, images, texts):
    def loss_fn(p):
        out = model.apply(p, images, texts)
        return colclip_loss(
            out["image_features"], out["text_features"],
            out["token_image_features"], out["token_text_features"],
            out["logit_scale"])["total_loss"]

    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), opt_state, loss


losses = []
for i in range(150):
    params, opt_state, loss = step(params, opt_state, images, texts)
    if i % 25 == 0 or i == 149:
        losses.append(float(jax.device_get(loss)))
        print(f"step {i}: loss {losses[-1]:.4f}")

assert losses[-1] < 2.5, f"loss did not fall below 2.5: {losses}"

out = model.apply(params, images, texts)
img_f = np.asarray(out["image_features"], np.float32)
txt_f = np.asarray(out["text_features"], np.float32)
r1_global = float(np.mean(np.argmax(txt_f @ img_f.T, axis=1) == cls))
sim = np.asarray(maxsim(
    out["token_text_features"].astype(jnp.float32),
    out["token_image_features"].astype(jnp.float32),
    mask_mode="plain"), np.float32)
r1_maxsim = float(np.mean(np.argmax(sim, axis=1) == cls))
print(f"t2i R@1 global={r1_global:.3f} maxsim={r1_maxsim:.3f} "
      f"(chance {1/n:.4f})")
chance = 1.0 / n
assert r1_global >= 3 * chance and r1_maxsim >= 3 * chance, \
    "retrieval did not beat chance"
print("VERIFY DRIVE OK")

"""CLIP and ColXLIP dual-tower models (TPU-native flax implementation).

Counterparts:
  - ``CLIP``: the installed open_clip base model the reference builds on
    (ColXLIP subclasses it, src/colxlip/model.py:458; surface described in
    SURVEY.md §2.2) — dual towers + learnable logit_scale (init ln(1/0.07),
    model.py:470) and optional logit_bias.
  - ``ColXLIP``: src/colxlip/model.py:458-686. Adds LN->Dense->GELU->LN token
    projection heads for both towers (model.py:518-530); ``encode_image``
    returns (pooled, projected tokens) (model.py:532-556); ``encode_text``
    zeroes ln_final token features at/after the argmax (EOT) position BEFORE
    the token head (model.py:581-593) — so after projection those positions
    all carry the same constant (non-zero) vector; the loss's "non-zero
    masked mean" must be understood with that in mind (see losses/colclip.py).
    ``forward`` returns the 4 feature tensors + logit_scale (model.py:631-686;
    similarity computation lives in the loss).
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import jax.numpy as jnp
from flax import linen as nn

from .configs import CLIPCfg
from .layers import LayerNorm, gelu, gelu_tanh, quick_gelu
from .text import TextTransformer
from .vision import VisionTransformer


def _select_act(cfg: CLIPCfg):
    if cfg.quick_gelu:
        return quick_gelu
    return gelu_tanh if getattr(cfg, "gelu_approximate", False) else gelu


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """F.normalize equivalent; fp32 compute, cast back.

    The clamp goes INSIDE the sqrt: sqrt has a NaN gradient at 0, and
    0 * nan = nan would defeat an outer max(). Exactly-zero rows occur at
    init (ColXLIP's masked text tokens project through zero-bias layers), so
    this must be grad-safe at 0 like torch's F.normalize.
    """
    orig = x.dtype
    x32 = x.astype(jnp.float32)
    sumsq = jnp.sum(jnp.square(x32), axis=axis, keepdims=True)
    norm = jnp.sqrt(jnp.maximum(sumsq, eps * eps))
    return (x32 / norm).astype(orig)


class TokenProjectionHead(nn.Module):
    """LN -> Dense -> GELU -> LN token head (reference model.py:518-530)."""
    embed_dim: int
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        x = LayerNorm(name="ln_in")(tokens)
        x = nn.Dense(
            self.embed_dim, name="proj", dtype=self.dtype, param_dtype=self.param_dtype
        )(x)
        x = gelu(x)
        x = LayerNorm(name="ln_out")(x)
        return x


class CLIP(nn.Module):
    """Dual-tower contrastive model."""
    cfg: CLIPCfg
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    remat: bool = False

    def setup(self):
        act: Callable = _select_act(self.cfg)
        self.visual = VisionTransformer(
            self.cfg.vision_cfg, embed_dim=self.cfg.embed_dim, act=act,
            dtype=self.dtype, param_dtype=self.param_dtype, remat=self.remat,
            name="visual",
        )
        self.text = TextTransformer(
            self.cfg.text_cfg, embed_dim=self.cfg.embed_dim, act=act,
            dtype=self.dtype, param_dtype=self.param_dtype, remat=self.remat,
            name="text",
        )
        self.logit_scale = self.param(
            "logit_scale",
            nn.initializers.constant(self.cfg.init_logit_scale),
            (), jnp.float32,
        )
        if self.cfg.init_logit_bias is not None:
            self.logit_bias = self.param(
                "logit_bias",
                nn.initializers.constant(self.cfg.init_logit_bias),
                (), jnp.float32,
            )
        else:
            self.logit_bias = None

    def encode_image(self, image, normalize: bool = False, train: bool = False):
        pooled, _ = self.visual(image, train=train)
        return l2_normalize(pooled) if normalize else pooled

    def encode_text(self, text, normalize: bool = False):
        pooled, _ = self.text(text)
        return l2_normalize(pooled) if normalize else pooled

    def __call__(self, image=None, text=None, train: bool = False):
        out = {"logit_scale": jnp.exp(self.logit_scale)}
        if image is not None:
            out["image_features"] = self.encode_image(image, normalize=True, train=train)
        if text is not None:
            out["text_features"] = self.encode_text(text, normalize=True)
        if self.logit_bias is not None:
            out["logit_bias"] = self.logit_bias
        return out


class ColXLIP(nn.Module):
    """CLIP + ColBERT-style token heads (reference model.py:458-686)."""
    cfg: CLIPCfg
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    remat: bool = False

    def setup(self):
        act: Callable = _select_act(self.cfg)
        # ColXLIP forces output_tokens on both towers (model.py:490-497); our
        # towers always compute tokens, callers pick what they need.
        self.visual = VisionTransformer(
            self.cfg.vision_cfg, embed_dim=self.cfg.embed_dim, act=act,
            dtype=self.dtype, param_dtype=self.param_dtype, remat=self.remat,
            name="visual",
        )
        self.text = TextTransformer(
            self.cfg.text_cfg, embed_dim=self.cfg.embed_dim, act=act,
            dtype=self.dtype, param_dtype=self.param_dtype, remat=self.remat,
            name="text",
        )
        self.logit_scale = self.param(
            "logit_scale",
            nn.initializers.constant(self.cfg.init_logit_scale),
            (), jnp.float32,
        )
        if self.cfg.init_logit_bias is not None:
            self.logit_bias = self.param(
                "logit_bias",
                nn.initializers.constant(self.cfg.init_logit_bias),
                (), jnp.float32,
            )
        else:
            self.logit_bias = None
        self.vision_token_layer = TokenProjectionHead(
            self.cfg.embed_dim, dtype=self.dtype, param_dtype=self.param_dtype,
            name="vision_token_layer",
        )
        self.text_token_layer = TokenProjectionHead(
            self.cfg.embed_dim, dtype=self.dtype, param_dtype=self.param_dtype,
            name="text_token_layer",
        )

    def encode_image(self, image, normalize: bool = False, train: bool = False):
        """(pooled, projected patch tokens)  — reference model.py:532-556."""
        pooled, tokens = self.visual(image, train=train)
        tokens = self.vision_token_layer(tokens)
        if normalize:
            pooled = l2_normalize(pooled)
            tokens = l2_normalize(tokens)
        return pooled, tokens

    def encode_text(self, text, normalize: bool = False):
        """(pooled, projected EOT-masked tokens) — reference model.py:558-609.

        Token features are zeroed at and after the EOT (argmax) position
        BEFORE the token projection head, exactly as the reference does
        (model.py:581-593): positions < eot keep their ln_final features.
        """
        pooled, token_features = self.text(text)
        if self.cfg.text_cfg.pool_type == "argmax":
            # the reference guards the zeroing on argmax pooling
            # (model.py:581-593) — under 'first'/'last'/'none' the argmax of
            # the token ids is not the EOT position and masking on it would
            # silently zero most of the sequence
            eot_idx = jnp.argmax(text, axis=-1)  # [B]
            positions = jnp.arange(text.shape[1])[None, :]  # [1, L]
            keep = positions < eot_idx[:, None]  # strictly before EOT
            token_features = jnp.where(keep[:, :, None], token_features, 0.0)
        token_features = self.text_token_layer(token_features)
        if normalize:
            pooled = l2_normalize(pooled)
            token_features = l2_normalize(token_features)
        return pooled, token_features

    def get_logits(self, image, text, alpha: Optional[float] = None):
        """Alpha-mixed (global, token) logits for a batch of pairs.

        The late-interaction inference combination the reference sketches in
        its commented-out forward (model.py:678-684) and its minimal example
        calls on FLAIR: logits = scale * (alpha*global + (1-alpha)*token).
        """
        if alpha is None:
            alpha = self.cfg.alpha
        image_features, token_image = self.encode_image(image, normalize=True)
        text_features, token_text = self.encode_text(text, normalize=True)
        scale = jnp.exp(self.logit_scale)
        global_sim = image_features @ text_features.T
        token_sim = self.compute_colbert_similarity(token_image, token_text).T
        logits_per_image = scale * (alpha * global_sim + (1 - alpha) * token_sim)
        return logits_per_image, logits_per_image.T

    def get_logits_as_clip(self, image, text):
        """Plain CLIP scoring, ignoring token features (reference
        minimal_example.py's comparison baseline)."""
        image_features, _ = self.encode_image(image, normalize=True)
        text_features, _ = self.encode_text(text, normalize=True)
        scale = jnp.exp(self.logit_scale)
        logits_per_image = scale * image_features @ text_features.T
        return logits_per_image, logits_per_image.T

    def compute_colbert_similarity(self, token_image_features, token_text_features):
        """Plain-mean MaxSim scoring (reference model.py:611-629).

        NOTE: this model-method variant uses an unmasked mean over text
        tokens; the training loss uses the non-zero masked mean
        (losses/colclip.py). Both are provided for parity.

        Dispatches through ops.maxsim (impl='auto'): the direct einsum
        materializes [M,K,Lt,Li] fp32 — ~4 GB for a 256x256 eval batch —
        so large problems stream instead (same values, bounded memory).
        """
        from ..ops.maxsim import maxsim

        return maxsim(token_text_features, token_image_features,
                      mask_mode="plain")

    def __call__(self, image=None, text=None, train: bool = False):
        """Returns the 4 feature tensors + logit_scale (reference model.py:631-686)."""
        out = {"logit_scale": jnp.exp(self.logit_scale)}
        if image is not None:
            image_features, token_image_features = self.encode_image(
                image, normalize=True, train=train
            )
            out["image_features"] = image_features
            out["token_image_features"] = token_image_features
        if text is not None:
            text_features, token_text_features = self.encode_text(text, normalize=True)
            out["text_features"] = text_features
            out["token_text_features"] = token_text_features
        if self.logit_bias is not None:
            out["logit_bias"] = self.logit_bias
        return out

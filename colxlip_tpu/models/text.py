"""Causal text transformer tower (TPU-native flax implementation).

Behavioral counterpart of the reference TextTransformer
(src/colxlip/transformer.py:858-1101):
  token_embedding + positional_embedding (:980-996) -> causal transformer
  (:960-966 builds the additive -inf mask; here expressed as is_causal which
  XLA fuses into the attention softmax) -> ln_final -> argmax(EOT) pooling
  via ``text_global_pool`` (:839-855) -> text_projection (:1093-1097).
Returns (pooled, tokens) when output_tokens (:1099-1101), where tokens are the
ln_final'd sequence features.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .configs import CLIPTextCfg
from .layers import LayerNorm, Transformer, gelu


def text_global_pool(x: jnp.ndarray, text: Optional[jnp.ndarray], pool_type: str):
    """Pool sequence features (reference transformer.py:839-855).

    'argmax' takes the feature at the position of the highest token id — the
    EOT token under CLIP's vocab layout (EOT id 49407 is the max).
    """
    if pool_type == "first":
        return x[:, 0]
    if pool_type == "last":
        return x[:, -1]
    if pool_type == "argmax":
        assert text is not None
        eot_idx = jnp.argmax(text, axis=-1)
        return jnp.take_along_axis(x, eot_idx[:, None, None], axis=1)[:, 0]
    return x


class TextTransformer(nn.Module):
    cfg: CLIPTextCfg
    embed_dim: int = 512
    act: Callable = gelu
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, text: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """text: [B, context_length] int32 token ids -> (pooled, tokens)."""
        cfg = self.cfg
        b, n = text.shape
        width = cfg.width

        token_embedding = nn.Embed(
            cfg.vocab_size, width,
            embedding_init=nn.initializers.normal(stddev=0.02),
            name="token_embedding",
            dtype=self.dtype, param_dtype=self.param_dtype,
        )
        x = token_embedding(text)

        positional_embedding = self.param(
            "positional_embedding",
            nn.initializers.normal(stddev=0.01),
            (cfg.context_length, width), jnp.float32,
        )
        x = x + positional_embedding[:n].astype(self.dtype)

        x = Transformer(
            width=width,
            layers=cfg.layers,
            heads=cfg.heads,
            mlp_ratio=cfg.mlp_ratio,
            ls_init_value=cfg.ls_init_value,
            act=self.act,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            remat=self.remat,
            # reference TextTransformer.init_parameters' depth-scaled
            # normals (transformer.py:925-940) — from-scratch loss curves
            # are only comparable with the same starting distribution
            scaled_init=True,
            name="transformer",
        )(x, is_causal=not cfg.no_causal_mask)

        x = LayerNorm(name="ln_final")(x)
        tokens = x
        pooled = text_global_pool(x, text, cfg.pool_type)

        if cfg.proj_type != "none" and self.embed_dim:
            if cfg.proj_bias:
                pooled = nn.Dense(
                    self.embed_dim, name="text_projection",
                    dtype=self.dtype, param_dtype=self.param_dtype,
                )(pooled)
            else:
                text_projection = self.param(
                    "text_projection",
                    nn.initializers.normal(stddev=width ** -0.5),
                    (width, self.embed_dim), jnp.float32,
                )
                pooled = pooled @ text_projection.astype(pooled.dtype)
        return pooled, tokens

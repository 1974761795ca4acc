"""Vision transformer tower (TPU-native flax implementation).

Behavioral counterpart of the reference VisionTransformer
(src/colxlip/transformer.py:515-836):
  conv patchify (:549-555) -> +cls & pos embed (:702-712) -> patch dropout
  (:713) -> ln_pre (:716) -> transformer blocks -> ln_post then pool
  (:734-741; default final_ln_after_pool=False applies ln_post to ALL tokens
  before pooling, so ColXLIP's token head sees ln_post'd tokens) -> @proj
  (:829-831). Returns (pooled, tokens) when output_tokens (:832-836).

TPU notes: the conv patchify is expressed as reshape+matmul feeding the MXU
(XLA lowers stride=kernel convs this way regardless; the explicit form keeps
the layout transparent), pooling is static-shape, and everything traces once
under jit.
"""
from __future__ import annotations

from typing import Any, Callable, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .configs import CLIPVisionCfg
from .layers import LayerNorm, PatchDropout, Transformer, gelu
from .pos_embed import get_2d_sincos_pos_embed


class VisionTransformer(nn.Module):
    cfg: CLIPVisionCfg
    embed_dim: int = 512
    act: Callable = gelu
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(
        self, image: jnp.ndarray, *, train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """image: [B, H, W, 3] (NHWC, TPU-preferred layout) -> (pooled, tokens)."""
        cfg = self.cfg
        b = image.shape[0]
        p = cfg.patch_size
        width = cfg.width

        if image.ndim == 3:
            if not jnp.issubdtype(image.dtype, jnp.integer):
                raise ValueError(
                    "3-D image batches must be planar uint8 YUV420 "
                    f"[B, H*3//2, W]; got {image.dtype} {image.shape}")
            # planar YUV420 feed [B, H*3//2, W] (ops/yuv420.py): 1.5 bytes/px
            # on the wire; chroma upsample + fused YUV->RGB->normalize affine
            # reconstructs [B, H, W, 3] float32 here, fused by XLA into the
            # patchify matmul's input
            from ..ops.yuv420 import decode_yuv420

            image = decode_yuv420(image, cfg.image_mean, cfg.image_std)
        gh, gw = image.shape[1] // p, image.shape[2] // p

        if jnp.issubdtype(image.dtype, jnp.integer):
            # uint8 feed (normalize-on-device): the host ships raw RGB bytes
            # (4x fewer host->device bytes) and the accelerator normalizes in
            # fp32 — numerically identical to the host float32 transform.
            mean = jnp.asarray(cfg.image_mean, jnp.float32)
            std = jnp.asarray(cfg.image_std, jnp.float32)
            image = (image.astype(jnp.float32) / 255.0 - mean) / std
        x = image.astype(self.dtype)
        # Patchify as one big matmul: [B, gh, p, gw, p, 3] -> [B, gh*gw, p*p*3] @ [p*p*3, width]
        x = x.reshape(b, gh, p, gw, p, 3)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, gh * gw, p * p * 3)
        # named 'conv1' to mirror the reference's nn.Conv2d patchify weights
        x = nn.Dense(
            width, use_bias=False, name="conv1", dtype=self.dtype, param_dtype=self.param_dtype
        )(x)

        scale = width ** -0.5
        class_embedding = self.param(
            "class_embedding",
            nn.initializers.normal(stddev=scale),
            (width,), jnp.float32,
        )
        cls = jnp.broadcast_to(class_embedding.astype(self.dtype), (b, 1, width))
        x = jnp.concatenate([cls, x], axis=1)

        n_pos = cfg.num_patches + 1
        if cfg.pos_embed_type == "learnable":
            positional_embedding = self.param(
                "positional_embedding",
                nn.initializers.normal(stddev=scale),
                (n_pos, width), jnp.float32,
            )
        elif cfg.pos_embed_type == "sin_cos_2d":
            if cfg.grid_size[0] != cfg.grid_size[1]:
                # fail at construction like the reference
                # (transformer.py:565) — the sincos table is built over a
                # square grid; a silent gh*gh table would only surface as a
                # distant broadcast error at `x + positional_embedding`
                raise ValueError(
                    "pos_embed_type='sin_cos_2d' needs a square patch grid; "
                    f"got {cfg.grid_size}")
            positional_embedding = self.param(
                "positional_embedding",
                lambda key, shape, dtype: jnp.asarray(
                    get_2d_sincos_pos_embed(width, cfg.grid_size[0], cls_token=True), dtype
                ),
                (n_pos, width), jnp.float32,
            )
        else:
            raise ValueError(cfg.pos_embed_type)
        x = x + positional_embedding.astype(self.dtype)

        if cfg.patch_dropout > 0.0:
            x = PatchDropout(cfg.patch_dropout, name="patch_dropout")(
                x, deterministic=not train
            )

        if not cfg.no_ln_pre:
            x = LayerNorm(name="ln_pre")(x)

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
            name="transformer",
        )(x)

        if cfg.attentional_pool:
            # bool attn-pool branch (reference transformer.py:729-733): pool
            # with learned queries, ln_post, then tok/avg pool the queries
            from .layers import AttentionalPooler

            x = AttentionalPooler(
                width, n_head=cfg.attn_pooler_heads,
                n_queries=cfg.attn_pooler_queries,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name="attn_pool",
            )(x)
            x = LayerNorm(name="ln_post")(x)
            pooled, tokens = self._global_pool(x, cfg.pool_type)
        elif cfg.final_ln_after_pool:
            # ln_post after pooling (reference transformer.py:734-737)
            pooled, tokens = self._global_pool(x, cfg.pool_type)
            pooled = LayerNorm(name="ln_post")(pooled)
        else:
            # ln_post before pooling (reference default, transformer.py:737-740)
            x = LayerNorm(name="ln_post")(x)
            pooled, tokens = self._global_pool(x, cfg.pool_type)

        proj = self.param(
            "proj", nn.initializers.normal(stddev=scale), (width, self.embed_dim), jnp.float32
        )
        pooled = pooled @ proj.astype(pooled.dtype)
        return pooled, tokens

    @staticmethod
    def _global_pool(x, pool_type: str):
        """reference transformer.py:691-699."""
        if pool_type == "avg":
            return x[:, 1:].mean(axis=1), x[:, 1:]
        if pool_type == "tok":
            return x[:, 0], x[:, 1:]
        return x, x

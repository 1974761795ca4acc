"""CoCa model family: attentional pooling + multimodal caption decoder.

Counterparts of the reference's vendored stack:
  - ``AttentionalPooler``: learned-query cross-attention pooling
    (transformer.py:169-210; used by VisionTransformer attn_pool paths
    :717-741)
  - ``MultimodalTransformer``: causal text self-attention interleaved with
    cross-attention into image tokens (transformer.py:1104-1211)
  - ``CoCa``: contrastive towers + caption decoder producing vocabulary
    logits; its outputs feed ``coca_loss`` (losses/coca.py, reference
    loss.py:298-340)
  - the ``embed_cls`` text-tower mode (CLS token appended at the END of the
    sequence with a pad-aware attention mask, pooling 'last',
    transformer.py:966-996) lives here as ``CoCaTextTower``.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .clip import l2_normalize
from .configs import CLIPCfg, CLIPTextCfg
from .layers import (
    AttentionalPooler,
    LayerNorm,
    MLP,
    MultiHeadAttention,
    Transformer,
    gelu,
    quick_gelu,
)
from .vision import VisionTransformer


@dataclasses.dataclass
class MultimodalCfg:
    """Decoder config (reference model.py CoCa MultimodalCfg analog)."""
    context_length: int = 76
    width: int = 512
    heads: int = 8
    layers: int = 12
    mlp_ratio: float = 4.0
    ls_init_value: Optional[float] = None

    @classmethod
    def from_dict(cls, d: dict) -> "MultimodalCfg":
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})


class CrossResidualBlock(nn.Module):
    """Cross-attention residual block (reference transformer.py:213-268 with
    ``is_cross_attention=True``): q = ln_1(x), k/v = ln_1_kv(visual), and
    the block carries its OWN MLP after ln_2 — the decoder pairs one of
    these with one self-attention block per layer (transformer.py:1189-1196),
    NOT a fused self+cross+single-MLP layer."""
    dim: int
    heads: int
    mlp_ratio: float = 4.0
    act: Callable = gelu
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    init_stds: Optional[tuple] = None

    @nn.compact
    def __call__(self, x, visual):
        if self.init_stds is not None:
            attn_std, proj_std, fc_std = self.init_stds
            inits = dict(
                in_proj_init=nn.initializers.normal(stddev=attn_std),
                out_proj_init=nn.initializers.normal(stddev=proj_std),
            )
            mlp_inits = dict(
                fc_init=nn.initializers.normal(stddev=fc_std),
                proj_init=nn.initializers.normal(stddev=proj_std),
            )
        else:
            inits, mlp_inits = {}, {}
        kv = LayerNorm(name="ln_1_kv")(visual)
        x = x + MultiHeadAttention(
            self.dim, self.heads, dtype=self.dtype,
            param_dtype=self.param_dtype, name="attn", **inits,
        )(LayerNorm(name="ln_1")(x), kv=kv)
        x = x + MLP(
            self.dim, self.mlp_ratio, act=self.act, dtype=self.dtype,
            param_dtype=self.param_dtype, name="mlp", **mlp_inits,
        )(LayerNorm(name="ln_2")(x))
        return x


class MultimodalTransformer(nn.Module):
    """Caption decoder: per layer one causal self-attention block THEN one
    cross-attention block into the image tokens, each with its own MLP
    (reference transformer.py:1104-1211 forward zips resblocks with
    cross_attn). Both stacks get the reference's depth-scaled init
    (init_parameters, :1148-1165). ``remat`` checkpoints each block pair —
    the reference's set_grad_checkpointing on the multimodal transformer
    (transformer.py:1208-1211)."""
    cfg: MultimodalCfg
    act: Callable = gelu
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    remat: Any = False

    @nn.compact
    def __call__(self, text_embs: jnp.ndarray, image_embs: jnp.ndarray):
        from .layers import ResidualAttentionBlock

        width, layers = self.cfg.width, self.cfg.layers
        stds = (
            width ** -0.5,
            (width ** -0.5) * ((2 * layers) ** -0.5),
            (2 * width) ** -0.5,
        )
        self_cls = ResidualAttentionBlock
        cross_cls = CrossResidualBlock
        if self.remat is True or self.remat == "full":
            self_cls = nn.remat(ResidualAttentionBlock, static_argnums=(3,))
            cross_cls = nn.remat(CrossResidualBlock)
        for i in range(self.cfg.layers):
            text_embs = self_cls(
                width, self.cfg.heads, self.cfg.mlp_ratio,
                ls_init_value=self.cfg.ls_init_value,
                act=self.act, dtype=self.dtype, param_dtype=self.param_dtype,
                init_stds=stds, name=f"resblocks_{i}",
            )(text_embs, None, True)
            text_embs = cross_cls(
                width, self.cfg.heads, self.cfg.mlp_ratio,
                act=self.act, dtype=self.dtype, param_dtype=self.param_dtype,
                init_stds=stds, name=f"cross_attn_{i}",
            )(text_embs, image_embs)
        return LayerNorm(name="ln_final")(text_embs)


class CoCaTextTower(nn.Module):
    """Text tower with CLS appended at the END + pad-aware mask.

    reference transformer.py:966-996 (embed_cls branch): num_pos = ctx + 1,
    causal mask combined with a mask hiding pad positions, pooling = 'last'
    (the CLS), ln_final applied AFTER pooling; tokens exclude the CLS.
    """
    cfg: CLIPTextCfg
    embed_dim: int = 512
    act: Callable = gelu
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    remat: Any = False

    @nn.compact
    def __call__(self, text: jnp.ndarray):
        cfg = self.cfg
        b, n = text.shape
        width = cfg.width
        num_pos = cfg.context_length + 1

        x = nn.Embed(
            cfg.vocab_size, width,
            embedding_init=nn.initializers.normal(stddev=0.02),
            name="token_embedding", dtype=self.dtype, param_dtype=self.param_dtype,
        )(text)
        cls_emb = self.param(
            "cls_emb", nn.initializers.normal(stddev=0.01), (width,), jnp.float32
        )
        x = jnp.concatenate(
            [x, jnp.broadcast_to(cls_emb.astype(self.dtype), (b, 1, width))], axis=1
        )
        pos = self.param(
            "positional_embedding", nn.initializers.normal(stddev=0.01),
            (num_pos, width), jnp.float32,
        )
        seq = n + 1
        x = x + pos[:seq].astype(self.dtype)

        # additive mask: causal everywhere; pad keys hidden ONLY from the
        # appended-CLS query row (reference build_cls_mask,
        # transformer.py:966-976: F.pad(cls_mask, (1, 0, n, 0), value=True)
        # top-pads n all-True query rows — text-token queries attend pads
        # purely causally — and LEFT-pads the key axis, so the CLS row's key
        # mask is [True, text != pad] shifted one position; replicated
        # exactly, shift included, for feature parity)
        causal = jnp.triu(jnp.full((seq, seq), -jnp.inf, jnp.float32), k=1)
        cls_key_ok = jnp.concatenate(
            [jnp.ones((b, 1), bool), text != cfg.pad_id], axis=1
        )  # [b, seq]
        cls_row = jnp.where(cls_key_ok, 0.0, -jnp.inf)  # [b, seq]
        rows = jnp.concatenate(
            [jnp.zeros((b, n, seq), jnp.float32), cls_row[:, None, :]], axis=1
        )  # [b, seq(q), seq(k)]
        mask = causal[None, None] + rows[:, None]  # [b, 1, seq, seq]

        x = Transformer(
            width=width, layers=cfg.layers, heads=cfg.heads,
            mlp_ratio=cfg.mlp_ratio, ls_init_value=cfg.ls_init_value,
            act=self.act, dtype=self.dtype, param_dtype=self.param_dtype,
            scaled_init=True, remat=self.remat,
            name="transformer",
        )(x, mask=mask)

        pooled = LayerNorm(name="ln_final")(x[:, -1])
        tokens = x[:, :-1]
        if cfg.proj_type != "none" and self.embed_dim:
            proj = self.param(
                "text_projection", nn.initializers.normal(stddev=width ** -0.5),
                (width, self.embed_dim), jnp.float32,
            )
            pooled = pooled @ proj.astype(pooled.dtype)
        return pooled, tokens


class VocabHead(nn.Module):
    """Bias-free vocab projection with an accessible kernel.

    Drop-in for ``nn.Dense(vocab_size, use_bias=False)`` — same param name
    ("kernel"), shape [in, vocab], and lecun-normal init, so checkpoints and
    the .pt import mapping are unchanged — but the kernel is a plain setup
    attribute, letting the CoCa forward hand it to the streaming vocab CE
    without materializing [B, L, V] logits.
    """
    in_features: int
    vocab_size: int
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    def setup(self):
        self.kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.in_features, self.vocab_size), self.param_dtype)

    def __call__(self, x):
        return jnp.dot(x, self.kernel.astype(self.dtype))


class CoCa(nn.Module):
    """Contrastive + captioning model (open_clip CoCa surface).

    forward(image, text) returns the dict coca_loss consumes: contrastive
    features, caption ``logits`` [B, L-1, vocab] and shifted ``labels``.
    """
    cfg: CLIPCfg
    multimodal_cfg: MultimodalCfg = dataclasses.field(default_factory=MultimodalCfg)
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    remat: bool = False

    def setup(self):
        act = quick_gelu if self.cfg.quick_gelu else gelu
        self.visual = VisionTransformer(
            self.cfg.vision_cfg, embed_dim=self.cfg.embed_dim, act=act,
            dtype=self.dtype, param_dtype=self.param_dtype, remat=self.remat,
            name="visual",
        )
        # pools vision-width tokens into multimodal-width query slots
        # (open_clip: AttentionalPooler(output_dim, vision_width))
        self.img_attn_pool = AttentionalPooler(
            self.multimodal_cfg.width,
            n_head=self.cfg.vision_cfg.attn_pooler_heads,
            n_queries=self.cfg.vision_cfg.attn_pooler_queries,
            dtype=self.dtype, param_dtype=self.param_dtype, name="attn_pool",
        )
        self.text = CoCaTextTower(
            self.cfg.text_cfg, embed_dim=self.cfg.embed_dim, act=act,
            dtype=self.dtype, param_dtype=self.param_dtype,
            remat=self.remat, name="text",
        )
        self.text_decoder = MultimodalTransformer(
            self.multimodal_cfg, act=act, dtype=self.dtype,
            param_dtype=self.param_dtype, remat=self.remat,
            name="text_decoder",
        )
        self.logit_scale = self.param(
            "logit_scale", nn.initializers.constant(self.cfg.init_logit_scale),
            (), jnp.float32,
        )
        # equivalent of nn.Dense(vocab, use_bias=False) with the kernel
        # exposed so the streaming caption CE (ops/vocab_ce.py) can fuse the
        # head matmul into the loss; param path stays "to_logits/kernel"
        self.to_logits = VocabHead(
            in_features=self.multimodal_cfg.width,
            vocab_size=self.cfg.text_cfg.vocab_size, name="to_logits",
            dtype=self.dtype, param_dtype=self.param_dtype,
        )

    def encode_image(self, image, normalize: bool = True):
        pooled, tokens = self.visual(image)
        return (l2_normalize(pooled) if normalize else pooled), tokens

    def encode_text(self, text, normalize: bool = True):
        pooled, tokens = self.text(text)
        return (l2_normalize(pooled) if normalize else pooled), tokens

    def embed_images(self, image):
        """Attn-pooled image token set the caption decoder conditions on —
        computed ONCE per image for autoregressive decoding
        (serving/generate.py)."""
        _, image_tokens = self.encode_image(image)
        return self.img_attn_pool(image_tokens)

    def caption_logits(self, text, image_embs):
        """[B, L-1, vocab] next-token logits for a (possibly padded) token
        prefix against precomputed image embeddings. Row t predicts token
        t+1; causal masking makes rows independent of later (pad) content."""
        _, text_tokens = self.encode_text(text)
        dec = self.text_decoder(text_tokens[:, :-1], image_embs)
        return self.to_logits(dec)

    def __call__(self, image, text, train: bool = False):
        image_features, image_tokens = self.encode_image(image)
        # caption path conditions on the attn-pooled image token set
        image_embs = self.img_attn_pool(image_tokens)
        # decoder consumes text minus the last position; labels are text
        # shifted left (standard teacher forcing)
        text_features, text_tokens = self.encode_text(text)
        dec_in = text_tokens[:, :-1]
        dec = self.text_decoder(dec_in, image_embs)
        logits = self.to_logits(dec)
        # caption_hidden + the head kernel let the loss layer fuse the vocab
        # matmul into a streaming CE (ops/vocab_ce.py); under jit whichever
        # of {logits, caption_hidden} the loss does not consume is dead-code
        # eliminated, so emitting both costs nothing
        return {
            "image_features": image_features,
            "text_features": text_features,
            "logits": logits,
            "caption_hidden": dec,
            "caption_head_kernel": self.to_logits.kernel,
            "labels": text[:, 1:],
            "logit_scale": jnp.exp(self.logit_scale),
        }

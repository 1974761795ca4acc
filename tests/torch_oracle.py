"""Minimal torch implementation of the reference architecture, used ONLY as a
numerics oracle for .pt checkpoint import parity tests.

Written fresh from the reference's documented structure (transformer.py:
pre-LN blocks with packed in_proj MHA; VisionTransformer conv patchify +
cls/pos + ln_pre + blocks + ln_post-then-pool + proj; TextTransformer with
causal mask and argmax(EOT) pooling; ColXLIP token heads model.py:518-530 and
EOT masking model.py:581-593). State-dict keys follow the OpenCLIP naming so
``convert_openclip_state_dict`` can be tested against real layouts.
"""
import math

import torch
import torch.nn as nn
import torch.nn.functional as F


class Block(nn.Module):
    def __init__(self, d, heads):
        super().__init__()
        self.ln_1 = nn.LayerNorm(d)
        self.attn = nn.MultiheadAttention(d, heads, batch_first=True)
        self.ln_2 = nn.LayerNorm(d)
        self.mlp = nn.Sequential()
        self.mlp.add_module("c_fc", nn.Linear(d, 4 * d))
        self.mlp.add_module("gelu", nn.GELU())
        self.mlp.add_module("c_proj", nn.Linear(4 * d, d))

    def forward(self, x, attn_mask=None):
        y = self.ln_1(x)
        x = x + self.attn(y, y, y, need_weights=False, attn_mask=attn_mask)[0]
        x = x + self.mlp(self.ln_2(x))
        return x


class TorchTransformer(nn.Module):
    def __init__(self, width, layers, heads):
        super().__init__()
        self.resblocks = nn.ModuleList([Block(width, heads) for _ in range(layers)])

    def forward(self, x, attn_mask=None):
        for b in self.resblocks:
            x = b(x, attn_mask=attn_mask)
        return x


class TorchVisionTower(nn.Module):
    def __init__(self, image_size, patch_size, width, layers, heads, embed_dim):
        super().__init__()
        self.patch_size = patch_size
        grid = image_size // patch_size
        self.conv1 = nn.Conv2d(3, width, patch_size, patch_size, bias=False)
        scale = width ** -0.5
        self.class_embedding = nn.Parameter(scale * torch.randn(width))
        self.positional_embedding = nn.Parameter(scale * torch.randn(grid * grid + 1, width))
        self.ln_pre = nn.LayerNorm(width)
        self.transformer = TorchTransformer(width, layers, heads)
        self.ln_post = nn.LayerNorm(width)
        self.proj = nn.Parameter(scale * torch.randn(width, embed_dim))

    def forward(self, x):
        x = self.conv1(x)                       # [B, w, g, g]
        x = x.reshape(x.shape[0], x.shape[1], -1).permute(0, 2, 1)
        cls = self.class_embedding.expand(x.shape[0], 1, -1)
        x = torch.cat([cls, x], dim=1) + self.positional_embedding
        x = self.ln_pre(x)
        x = self.transformer(x)
        x = self.ln_post(x)
        pooled, tokens = x[:, 0], x[:, 1:]
        pooled = pooled @ self.proj
        return pooled, tokens


class TorchCLIP(nn.Module):
    def __init__(self, image_size=64, patch_size=16, vwidth=128, vlayers=2,
                 vheads=4, twidth=128, tlayers=2, theads=4, embed_dim=128,
                 vocab=49408, ctx=32):
        super().__init__()
        self.visual = TorchVisionTower(image_size, patch_size, vwidth, vlayers, vheads, embed_dim)
        self.token_embedding = nn.Embedding(vocab, twidth)
        nn.init.normal_(self.token_embedding.weight, std=0.02)
        self.positional_embedding = nn.Parameter(0.01 * torch.randn(ctx, twidth))
        self.transformer = TorchTransformer(twidth, tlayers, theads)
        self.ln_final = nn.LayerNorm(twidth)
        self.text_projection = nn.Parameter(twidth ** -0.5 * torch.randn(twidth, embed_dim))
        self.logit_scale = nn.Parameter(torch.tensor(math.log(1 / 0.07)))
        mask = torch.full((ctx, ctx), float("-inf")).triu_(1)
        self.register_buffer("attn_mask", mask, persistent=False)

    def encode_text_tokens(self, text):
        x = self.token_embedding(text) + self.positional_embedding
        x = self.transformer(x, attn_mask=self.attn_mask)
        x = self.ln_final(x)
        pooled = x[torch.arange(x.shape[0]), text.argmax(dim=-1)]
        pooled = pooled @ self.text_projection
        return pooled, x

    def forward(self, image, text):
        img_pooled, img_tokens = self.visual(image)
        txt_pooled, txt_tokens = self.encode_text_tokens(text)
        return img_pooled, img_tokens, txt_pooled, txt_tokens


class TorchColXLIP(TorchCLIP):
    def __init__(self, **kw):
        super().__init__(**kw)
        vwidth = kw.get("vwidth", 128)
        twidth = kw.get("twidth", 128)
        embed_dim = kw.get("embed_dim", 128)
        self.vision_token_layer = nn.Sequential(
            nn.LayerNorm(vwidth), nn.Linear(vwidth, embed_dim), nn.GELU(),
            nn.LayerNorm(embed_dim),
        )
        self.text_token_layer = nn.Sequential(
            nn.LayerNorm(twidth), nn.Linear(twidth, embed_dim), nn.GELU(),
            nn.LayerNorm(embed_dim),
        )

    def encode_image(self, image, normalize=True):
        pooled, tokens = self.visual(image)
        tokens = self.vision_token_layer(tokens)
        if normalize:
            pooled = F.normalize(pooled, dim=-1)
            tokens = F.normalize(tokens, dim=-1)
        return pooled, tokens

    def encode_text(self, text, normalize=True):
        pooled, token_features = self.encode_text_tokens(text)
        # reference model.py:581-593: zero at/after EOT, BEFORE projection
        eot = text.argmax(dim=-1)
        pos = torch.arange(text.shape[1])[None, :]
        keep = pos < eot[:, None]
        token_features = torch.where(keep[:, :, None], token_features,
                                     torch.zeros_like(token_features))
        token_features = self.text_token_layer(token_features)
        if normalize:
            pooled = F.normalize(pooled, dim=-1)
            token_features = F.normalize(token_features, dim=-1)
        return pooled, token_features


class CrossBlock(nn.Module):
    """Reference ResidualAttentionBlock(is_cross_attention=True)
    (transformer.py:213-268): q = ln_1(x), k/v = ln_1_kv(kv), own MLP."""

    def __init__(self, d, heads):
        super().__init__()
        self.ln_1 = nn.LayerNorm(d)
        self.ln_1_kv = nn.LayerNorm(d)
        self.attn = nn.MultiheadAttention(d, heads, batch_first=True)
        self.ln_2 = nn.LayerNorm(d)
        self.mlp = nn.Sequential()
        self.mlp.add_module("c_fc", nn.Linear(d, 4 * d))
        self.mlp.add_module("gelu", nn.GELU())
        self.mlp.add_module("c_proj", nn.Linear(4 * d, d))

    def forward(self, x, kv):
        k = self.ln_1_kv(kv)
        x = x + self.attn(self.ln_1(x), k, k, need_weights=False)[0]
        x = x + self.mlp(self.ln_2(x))
        return x


class TorchMultimodalDecoder(nn.Module):
    """Reference MultimodalTransformer (transformer.py:1104-1211): per layer
    one causal self-attn resblock zipped with one cross-attn block; ln_final;
    text_projection = the width->output_dim head."""

    def __init__(self, width, layers, heads, ctx, output_dim):
        super().__init__()
        self.resblocks = nn.ModuleList(
            [Block(width, heads) for _ in range(layers)])
        self.cross_attn = nn.ModuleList(
            [CrossBlock(width, heads) for _ in range(layers)])
        self.ln_final = nn.LayerNorm(width)
        self.text_projection = nn.Parameter(
            width ** -0.5 * torch.randn(width, output_dim))
        mask = torch.full((ctx, ctx), float("-inf")).triu_(1)
        self.register_buffer("attn_mask", mask, persistent=False)

    def forward(self, text_embs, image_embs):
        n = text_embs.shape[1]
        x = text_embs
        for blk, cross in zip(self.resblocks, self.cross_attn):
            x = blk(x, attn_mask=self.attn_mask[:n, :n])
            x = cross(x, image_embs)
        return self.ln_final(x) @ self.text_projection


class TorchCoCaTextTower(nn.Module):
    """Reference TextTransformer with embed_cls (transformer.py:960-1101):
    CLS appended at the END, causal+cls additive mask (build_cls_mask with
    its left-pad key shift), pooling 'last', ln_final AFTER pooling, tokens
    exclude the CLS and skip ln_final."""

    def __init__(self, width, layers, heads, ctx, vocab, embed_dim,
                 pad_id=0):
        super().__init__()
        self.pad_id = pad_id
        self.heads = heads
        self.num_pos = ctx + 1
        self.token_embedding = nn.Embedding(vocab, width)
        nn.init.normal_(self.token_embedding.weight, std=0.02)
        self.cls_emb = nn.Parameter(0.01 * torch.randn(width))
        self.positional_embedding = nn.Parameter(
            0.01 * torch.randn(self.num_pos, width))
        self.transformer = TorchTransformer(width, layers, heads)
        self.ln_final = nn.LayerNorm(width)
        self.text_projection = nn.Parameter(
            width ** -0.5 * torch.randn(width, embed_dim))
        mask = torch.full((self.num_pos, self.num_pos), float("-inf")).triu_(1)
        self.register_buffer("attn_mask", mask, persistent=False)

    def build_cls_mask(self, text):
        cls_mask = (text != self.pad_id).unsqueeze(1)
        cls_mask = F.pad(cls_mask, (1, 0, cls_mask.shape[2], 0), value=True)
        additive = torch.zeros(cls_mask.shape, dtype=torch.float32)
        additive.masked_fill_(~cls_mask, float("-inf"))
        return torch.repeat_interleave(additive, self.heads, 0)

    def forward(self, text):
        seq = text.shape[1] + 1
        x = self.token_embedding(text)
        x = torch.cat([x, self.cls_emb.expand(x.shape[0], 1, -1)], dim=1)
        attn_mask = (self.attn_mask[None, :seq, :seq]
                     + self.build_cls_mask(text)[:, :seq, :seq])
        x = x + self.positional_embedding[:seq]
        # nn.MultiheadAttention accepts [B*heads, L, L] additive masks
        for b in self.transformer.resblocks:
            x = b(x, attn_mask=attn_mask)
        pooled = self.ln_final(x[:, -1])
        tokens = x[:, :-1]
        pooled = pooled @ self.text_projection
        return pooled, tokens

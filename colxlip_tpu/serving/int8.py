"""int8 post-training-quantized encoders (serving path, both towers).

The v5e MXU runs int8 x int8 -> int32 matmuls at 2x the bf16 rate
(394 vs 197 TOPS nominal), and image encoding is matmul-dominated. This
module is a standalone functional forward of the VisionTransformer
(models/vision.py) and TextTransformer (models/text.py) — mirrored exactly;
tested for feature agreement against ``model.apply`` — whose Dense layers
run:

  - WEIGHTS:     per-output-channel symmetric int8, quantized once offline
                 from the trained fp32 params (``quantize_vision_params``).
  - ACTIVATIONS: per-token (row-wise absmax) dynamic symmetric int8,
                 quantized on the fly in the same fused region.
  - MATMUL:      ``lax.dot_general`` with int8 operands and
                 ``preferred_element_type=int32`` — XLA lowers this to the
                 native int8 MXU path.
  - EPILOGUE:    dequant (row-scale x col-scale outer product), bias add,
                 LayerNorm/softmax/GELU in fp32/bf16 as in the bf16 model.

The attention core stays bf16 (``ops/fused_attention``): at N<=257 it is
bandwidth/VPU-bound, so int8 buys nothing there.

No reference counterpart (the PyTorch repo serves in fp16 AMP only) —
this is a TPU-native "beyond" feature; scope is the standard ViT serving
configuration (learnable pos-embed, tok pooling, no attentional pool /
patch dropout — the shipped ViT-B/L configs).
"""
from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp


def _quant_weight(w: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """fp32 [in, out] -> per-output-channel symmetric int8 + fp32 scale."""
    w = jnp.asarray(w, jnp.float32)
    scale = jnp.max(jnp.abs(w), axis=0) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return {"q": q, "scale": scale}


def quantize_vision_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """Quantize the Dense kernels of a trained ``visual`` tower.

    params: the full model params dict (``{"params": {...}}`` or the inner
    dict). Returns a pytree with int8 kernels + scales for every matmul and
    the remaining (LN/embedding/bias) leaves in fp32.
    """
    p = params.get("params", params)
    v = p["visual"]
    out: Dict[str, Any] = {
        "class_embedding": jnp.asarray(v["class_embedding"], jnp.float32),
        "positional_embedding": jnp.asarray(
            v["positional_embedding"], jnp.float32),
        "ln_pre": v.get("ln_pre"),
        "ln_post": v["ln_post"],
        "proj": _quant_weight(v["proj"]),
        "conv1": _quant_weight(v["conv1"]["kernel"]),
        "blocks": [],
    }
    blocks = v["transformer"]
    i = 0
    while f"resblocks_{i}" in blocks:
        blk = blocks[f"resblocks_{i}"]
        out["blocks"].append({
            "ln_1": blk["ln_1"],
            "ln_2": blk["ln_2"],
            "in_proj": {**_quant_weight(blk["attn"]["in_proj"]["kernel"]),
                        "bias": jnp.asarray(blk["attn"]["in_proj"]["bias"],
                                            jnp.float32)},
            "out_proj": {**_quant_weight(blk["attn"]["out_proj"]["kernel"]),
                         "bias": jnp.asarray(blk["attn"]["out_proj"]["bias"],
                                             jnp.float32)},
            "c_fc": {**_quant_weight(blk["mlp"]["c_fc"]["kernel"]),
                     "bias": jnp.asarray(blk["mlp"]["c_fc"]["bias"],
                                         jnp.float32)},
            "c_proj": {**_quant_weight(blk["mlp"]["c_proj"]["kernel"]),
                       "bias": jnp.asarray(blk["mlp"]["c_proj"]["bias"],
                                           jnp.float32)},
        })
        i += 1
    return out


def _qdense(x: jnp.ndarray, qw: Dict[str, jnp.ndarray],
            out_dtype=jnp.bfloat16) -> jnp.ndarray:
    """[..., in] fp -> [..., out] via int8 x int8 -> int32 MXU matmul.

    Activations: per-row (token) dynamic absmax int8. The quant/dequant
    elementwise work fuses around the matmul; the matmul itself runs int8.
    Output is bf16 by default — carrying fp32 between layers blew HBM with
    591 MB temps per layer at batch 1024 (quant noise dwarfs bf16 rounding).
    """
    shape = x.shape
    xf = x.reshape(-1, shape[-1]).astype(jnp.float32)
    row_scale = jnp.max(jnp.abs(xf), axis=1, keepdims=True) / 127.0
    row_scale = jnp.maximum(row_scale, 1e-12)
    xq = jnp.clip(jnp.round(xf / row_scale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, qw["q"], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * row_scale * qw["scale"][None, :]
    if "bias" in qw:
        y = y + qw["bias"]
    return y.astype(out_dtype).reshape(*shape[:-1], qw["q"].shape[1])


def _layernorm(x: jnp.ndarray, ln: Dict[str, jnp.ndarray],
               out_dtype=jnp.bfloat16) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + 1e-5)
    y = y * jnp.asarray(ln["scale"], jnp.float32) + jnp.asarray(
        ln["bias"], jnp.float32)
    return y.astype(out_dtype)


def vision_encode_int8(cfg, qparams: Dict[str, Any], images: jnp.ndarray,
                       *, normalize: bool = True,
                       interpret: bool = False) -> jnp.ndarray:
    """images [B, H, W, 3] (fp or uint8) -> pooled features [B, embed_dim].

    cfg: the model's CLIPCfg. Mirrors VisionTransformer.__call__
    (models/vision.py:34-140) for the standard serving configuration.
    """
    vcfg = cfg.vision_cfg
    if (vcfg.attentional_pool or vcfg.ls_init_value is not None
            or vcfg.final_ln_after_pool or vcfg.pool_type != "tok"
            or vcfg.pos_embed_type != "learnable"):
        raise NotImplementedError(
            "int8 serving path covers the standard ViT serving config "
            "(learnable pos-embed, tok pooling, no attn-pool/LayerScale); "
            "use the bf16 model for other configurations")
    b = images.shape[0]
    p = vcfg.patch_size
    gh, gw = images.shape[1] // p, images.shape[2] // p
    width = vcfg.width

    if jnp.issubdtype(images.dtype, jnp.integer):
        mean = jnp.asarray(vcfg.image_mean, jnp.float32)
        std = jnp.asarray(vcfg.image_std, jnp.float32)
        images = (images.astype(jnp.float32) / 255.0 - mean) / std

    x = images.astype(jnp.float32)
    x = x.reshape(b, gh, p, gw, p, 3)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, gh * gw, p * p * 3)
    x = _qdense(x, qparams["conv1"])

    cls = jnp.broadcast_to(
        qparams["class_embedding"].astype(jnp.bfloat16), (b, 1, width))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + qparams["positional_embedding"].astype(jnp.bfloat16)
    if qparams.get("ln_pre") is not None:
        x = _layernorm(x, qparams["ln_pre"])

    from ..ops.fused_attention import fused_mha_packed, fused_mha_reference

    heads = vcfg.heads
    for blk in qparams["blocks"]:
        h = _layernorm(x, blk["ln_1"])
        qkv = _qdense(h, blk["in_proj"])
        if interpret or jax.default_backend() == "tpu":
            attn = fused_mha_packed(qkv, heads, False, 0, interpret)
        else:
            attn = fused_mha_reference(qkv, heads, False)
        x = x + _qdense(attn, blk["out_proj"])
        h = _layernorm(x, blk["ln_2"])
        h = _qdense(h, blk["c_fc"])
        if cfg.quick_gelu:
            # QuickGELU checkpoints (OpenAI / laion400m tags) — silently
            # serving erf-GELU here diverged far beyond quantization noise
            h = h * jax.nn.sigmoid(1.702 * h)
        else:
            h = jax.nn.gelu(h, approximate=cfg.gelu_approximate)
        x = x + _qdense(h, blk["c_proj"])

    x = _layernorm(x, qparams["ln_post"])
    pooled = x[:, 0]
    pooled = _qdense(pooled, qparams["proj"], out_dtype=jnp.float32)
    if normalize:
        n = jnp.sqrt(jnp.maximum(jnp.sum(pooled * pooled, -1, keepdims=True),
                                 1e-12))
        pooled = pooled / n
    return pooled


def quantize_text_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """Quantize the Dense kernels of a trained ``text`` tower (same scheme
    as ``quantize_vision_params``; embeddings/LN/bias stay fp32)."""
    p = params.get("params", params)
    t = p["text"]
    proj = t["text_projection"]
    if isinstance(proj, dict):  # Dense variant (proj_bias=True)
        qproj = {**_quant_weight(proj["kernel"]),
                 "bias": jnp.asarray(proj["bias"], jnp.float32)}
    else:
        qproj = _quant_weight(proj)
    out: Dict[str, Any] = {
        "token_embedding": jnp.asarray(
            t["token_embedding"]["embedding"], jnp.float32),
        "positional_embedding": jnp.asarray(
            t["positional_embedding"], jnp.float32),
        "ln_final": t["ln_final"],
        "text_projection": qproj,
        "blocks": [],
    }
    blocks = t["transformer"]
    i = 0
    while f"resblocks_{i}" in blocks:
        blk = blocks[f"resblocks_{i}"]
        out["blocks"].append({
            "ln_1": blk["ln_1"],
            "ln_2": blk["ln_2"],
            "in_proj": {**_quant_weight(blk["attn"]["in_proj"]["kernel"]),
                        "bias": jnp.asarray(blk["attn"]["in_proj"]["bias"],
                                            jnp.float32)},
            "out_proj": {**_quant_weight(blk["attn"]["out_proj"]["kernel"]),
                         "bias": jnp.asarray(blk["attn"]["out_proj"]["bias"],
                                             jnp.float32)},
            "c_fc": {**_quant_weight(blk["mlp"]["c_fc"]["kernel"]),
                     "bias": jnp.asarray(blk["mlp"]["c_fc"]["bias"],
                                         jnp.float32)},
            "c_proj": {**_quant_weight(blk["mlp"]["c_proj"]["kernel"]),
                       "bias": jnp.asarray(blk["mlp"]["c_proj"]["bias"],
                                           jnp.float32)},
        })
        i += 1
    return out


def text_encode_int8(cfg, qparams: Dict[str, Any], text: jnp.ndarray,
                     *, normalize: bool = True,
                     interpret: bool = False) -> jnp.ndarray:
    """text [B, L] int32 -> pooled features [B, embed_dim].

    Mirrors TextTransformer.__call__ (models/text.py) for the standard
    serving configuration: causal mask + argmax(EOT) pooling.
    """
    tcfg = cfg.text_cfg
    if tcfg.pool_type != "argmax" or tcfg.no_causal_mask:
        raise NotImplementedError(
            "int8 text serving covers the standard causal/argmax config; "
            "use the bf16 model for other configurations")
    x = qparams["token_embedding"][text].astype(jnp.bfloat16)
    n = text.shape[1]
    x = x + qparams["positional_embedding"][:n].astype(jnp.bfloat16)

    from ..ops.fused_attention import fused_mha_packed, fused_mha_reference

    heads = tcfg.heads
    for blk in qparams["blocks"]:
        h = _layernorm(x, blk["ln_1"])
        qkv = _qdense(h, blk["in_proj"])
        if interpret or jax.default_backend() == "tpu":
            attn = fused_mha_packed(qkv, heads, True, 0, interpret)
        else:
            attn = fused_mha_reference(qkv, heads, True)
        x = x + _qdense(attn, blk["out_proj"])
        h = _layernorm(x, blk["ln_2"])
        h = _qdense(h, blk["c_fc"])
        if cfg.quick_gelu:
            h = h * jax.nn.sigmoid(1.702 * h)
        else:
            h = jax.nn.gelu(h, approximate=cfg.gelu_approximate)
        x = x + _qdense(h, blk["c_proj"])

    x = _layernorm(x, qparams["ln_final"])
    pooled = x[jnp.arange(x.shape[0]), jnp.argmax(text, axis=-1)]
    pooled = _qdense(pooled, qparams["text_projection"],
                     out_dtype=jnp.float32)
    if normalize:
        nrm = jnp.sqrt(jnp.maximum(
            jnp.sum(pooled * pooled, -1, keepdims=True), 1e-12))
        pooled = pooled / nrm
    return pooled

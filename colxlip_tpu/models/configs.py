"""Model configuration dataclasses and the JSON architecture registry.

TPU-native re-design of the reference's config surface:
  - ``CLIPVisionCfg`` / ``CLIPTextCfg``  (reference: src/colxlip/model.py:26-84)
  - JSON registry scanned from ``model_configs/``  (reference: src/colxlip/factory.py:35-84)

Only fields that are actually read somewhere in this framework are kept; vestigial
FLAIR/DreamLIP ablation fields are dropped (SURVEY.md §7.4).
"""
from __future__ import annotations

import copy
import logging
import dataclasses
import json
import pathlib
from typing import Optional, Tuple, Union

import jax.numpy as jnp


logger = logging.getLogger(__name__)


@dataclasses.dataclass
class CLIPVisionCfg:
    """Vision tower config (reference: src/colxlip/model.py:26-63)."""
    layers: int = 12
    width: int = 768
    head_width: int = 64
    mlp_ratio: float = 4.0
    patch_size: int = 16
    image_size: Union[int, Tuple[int, int]] = 224
    ls_init_value: Optional[float] = None          # LayerScale init
    patch_dropout: float = 0.0
    attentional_pool: bool = False
    attn_pooler_queries: int = 256
    attn_pooler_heads: int = 8
    no_ln_pre: bool = False
    pos_embed_type: str = "learnable"              # 'learnable' | 'sin_cos_2d'
    final_ln_after_pool: bool = False
    pool_type: str = "tok"                          # 'tok' | 'avg' | 'none'
    output_tokens: bool = False
    # normalization stats for the device-side uint8 path (OPENAI CLIP stats;
    # same values as data/transforms.py). When the tower receives an integer
    # image batch it applies (x/255 - mean)/std in fp32 on the accelerator.
    image_mean: Tuple[float, float, float] = (0.48145466, 0.4578275, 0.40821073)
    image_std: Tuple[float, float, float] = (0.26862954, 0.26130258, 0.27577711)

    @property
    def heads(self) -> int:
        return self.width // self.head_width

    @property
    def grid_size(self) -> Tuple[int, int]:
        h, w = _to_2tuple(self.image_size)
        return h // self.patch_size, w // self.patch_size

    @property
    def num_patches(self) -> int:
        gh, gw = self.grid_size
        return gh * gw


@dataclasses.dataclass
class CLIPTextCfg:
    """Text tower config (reference: src/colxlip/model.py:66-84)."""
    context_length: int = 77
    vocab_size: int = 49408
    width: int = 512
    heads: int = 8
    layers: int = 12
    mlp_ratio: float = 4.0
    ls_init_value: Optional[float] = None
    embed_cls: bool = False
    pad_id: int = 0
    no_causal_mask: bool = False
    pool_type: str = "argmax"                       # 'first'|'last'|'argmax'|'none'
    proj_type: str = "linear"                       # 'linear' | 'mlp' | 'none'
    proj_bias: bool = False
    output_tokens: bool = False


@dataclasses.dataclass
class CLIPCfg:
    """Full model config = one JSON file in model_configs/."""
    embed_dim: int = 512
    vision_cfg: CLIPVisionCfg = dataclasses.field(default_factory=CLIPVisionCfg)
    text_cfg: CLIPTextCfg = dataclasses.field(default_factory=CLIPTextCfg)
    quick_gelu: bool = False
    gelu_approximate: bool = False   # tanh-approx GELU: ~10% faster tower on
                                     # v5e (erf is transcendental-heavy on the
                                     # VPU); off by default for exact parity
    init_logit_scale: float = 2.6592600345530126    # ln(1/0.07), model.py:470
    init_logit_bias: Optional[float] = None
    alpha: float = 0.5                               # ColXLIP global/token loss mix

    @classmethod
    def from_dict(cls, d: dict) -> "CLIPCfg":
        d = copy.deepcopy(d)
        vision = d.pop("vision_cfg", {})
        text = d.pop("text_cfg", {})
        known_v = {f.name for f in dataclasses.fields(CLIPVisionCfg)}
        known_t = {f.name for f in dataclasses.fields(CLIPTextCfg)}
        known_c = {f.name for f in dataclasses.fields(cls)} | {"multimodal_cfg"}
        # unknown keys are tolerated (vestigial reference-config fields) but
        # WARNED about: a typo'd field silently building a default-valued
        # architecture trains the wrong model with no diagnostic
        dropped = ([k for k in vision if k not in known_v]
                   + [k for k in text if k not in known_t]
                   + [k for k in d if k not in known_c])
        if dropped:
            logger.warning("model config: ignoring unknown keys %s", dropped)
        return cls(
            vision_cfg=CLIPVisionCfg(**{k: v for k, v in vision.items() if k in known_v}),
            text_cfg=CLIPTextCfg(**{k: v for k, v in text.items() if k in known_t}),
            **{k: v for k, v in d.items() if k in known_c and k not in ("vision_cfg", "text_cfg", "multimodal_cfg")},
        )

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)


@dataclasses.dataclass
class PrecisionPolicy:
    """TPU mixed-precision policy.

    Replaces the reference's AMP autocast + GradScaler machinery
    (src/main.py:301, src/colxlip/train.py:95-96): on TPU, bf16 compute with
    fp32 params/optimizer needs no loss scaling. LayerNorm, softmax, logits and
    the loss always run in fp32 regardless of policy.
    """
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16

    @classmethod
    def from_precision(cls, precision: str) -> "PrecisionPolicy":
        if precision in ("fp32", "amp", "float32"):
            return cls(jnp.float32, jnp.float32)
        if precision in ("bf16", "amp_bf16", "bfloat16"):
            return cls(jnp.float32, jnp.bfloat16)
        if precision in ("pure_bf16",):
            return cls(jnp.bfloat16, jnp.bfloat16)
        raise ValueError(f"unsupported precision: {precision!r}")


def _to_2tuple(x):
    return tuple(x) if isinstance(x, (tuple, list)) else (x, x)


# --------------------------------------------------------------------------
# JSON architecture registry (reference: src/colxlip/factory.py:35-84)
# --------------------------------------------------------------------------

_MODEL_CONFIG_DIR = pathlib.Path(__file__).resolve().parent.parent / "model_configs"
_MODEL_CONFIGS: dict = {}


def _natural_key(s: str):
    import re
    return [int(t) if t.isdigit() else t for t in re.split(r"(\d+)", s.lower())]


def _rescan_model_configs() -> None:
    _MODEL_CONFIGS.clear()
    if not _MODEL_CONFIG_DIR.is_dir():
        return
    for p in _MODEL_CONFIG_DIR.glob("*.json"):
        with open(p) as f:
            cfg = json.load(f)
        if "embed_dim" in cfg and "vision_cfg" in cfg and "text_cfg" in cfg:
            _MODEL_CONFIGS[p.stem] = cfg
    # natural-sort keys like the reference registry (factory.py:68-71)
    ordered = {k: _MODEL_CONFIGS[k] for k in sorted(_MODEL_CONFIGS, key=_natural_key)}
    _MODEL_CONFIGS.clear()
    _MODEL_CONFIGS.update(ordered)


def list_models():
    """Enumerate registered architectures (reference: factory.py:74-76)."""
    return list(_MODEL_CONFIGS.keys())


def add_model_config(path) -> None:
    """Register a single JSON model config file (reference: factory.py:79-84).

    Applies the same schema gate as the directory scan — registering an
    arbitrary JSON here would otherwise flow into an all-defaults CLIPCfg."""
    p = pathlib.Path(path)
    with open(p) as f:
        cfg = json.load(f)
    if not ("embed_dim" in cfg and "vision_cfg" in cfg and "text_cfg" in cfg):
        raise ValueError(
            f"{p}: not a model config (needs embed_dim/vision_cfg/text_cfg)")
    _MODEL_CONFIGS[p.stem] = cfg


def get_model_config(model_name: str) -> Optional[dict]:
    if model_name in _MODEL_CONFIGS:
        return copy.deepcopy(_MODEL_CONFIGS[model_name])
    return None


_rescan_model_configs()

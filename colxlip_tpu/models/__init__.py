from .configs import (
    CLIPCfg,
    CLIPTextCfg,
    CLIPVisionCfg,
    PrecisionPolicy,
    add_model_config,
    get_model_config,
    list_models,
)
from .clip import CLIP, ColXLIP, TokenProjectionHead, l2_normalize
from .text import TextTransformer, text_global_pool
from .vision import VisionTransformer

__all__ = [
    "CLIP",
    "ColXLIP",
    "CLIPCfg",
    "CLIPTextCfg",
    "CLIPVisionCfg",
    "PrecisionPolicy",
    "TokenProjectionHead",
    "TextTransformer",
    "VisionTransformer",
    "add_model_config",
    "get_model_config",
    "l2_normalize",
    "list_models",
    "text_global_pool",
]

"""colxlip_tpu: a TPU-native contrastive image-text training framework.

Re-designed from scratch for jax/XLA/pallas with the capabilities of the
ColXLIP reference (dual-tower CLIP + ColBERT-style token-level MaxSim
contrastive training and retrieval). Public API mirrors the reference's
``colxlip/__init__.py`` factory surface.
"""
from .factory import (
    create_loss,
    create_model,
    create_model_and_transforms,
    get_tokenizer,
    init_params,
    load_weights,
)
from .models import (
    CLIP,
    CLIPCfg,
    CLIPTextCfg,
    CLIPVisionCfg,
    ColXLIP,
    add_model_config,
    get_model_config,
    list_models,
)

__version__ = "0.1.0"

__all__ = [
    "CLIP",
    "CLIPCfg",
    "CLIPTextCfg",
    "CLIPVisionCfg",
    "ColXLIP",
    "add_model_config",
    "create_loss",
    "create_model",
    "create_model_and_transforms",
    "get_model_config",
    "get_tokenizer",
    "init_params",
    "list_models",
    "load_weights",
]

"""Model factory and registry.

Counterpart of reference src/colxlip/factory.py:
  - JSON config registry (factory.py:35-84) — see models/configs.py
  - ``create_model`` (factory.py:204-364): "colxlip" in the model name selects
    the ColXLIP class, otherwise plain CLIP (factory.py:286-289); precision
    policy; pretrained/checkpoint loading with base-CLIP weight reuse for
    colxlip models (tag strip, factory.py:318-341) and pos-embed resize
  - ``create_model_and_transforms`` (factory.py:367-421)
  - ``get_tokenizer`` (factory.py:87-128)
  - ``create_loss`` (factory.py:424-461) -> a TrainStepConfig here: losses are
    pure functions selected by the train step
"""
from __future__ import annotations

import dataclasses
import logging
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .data.tokenizer import SimpleTokenizer
from .data.transforms import (
    AugmentationCfg,
    ImageTransform,
    OPENAI_DATASET_MEAN,
    OPENAI_DATASET_STD,
    image_transform,
)
from .models import CLIP, CLIPCfg, ColXLIP, PrecisionPolicy, get_model_config, list_models
from .parallel.train_step import TrainStepConfig

logger = logging.getLogger(__name__)


def create_model(
    model_name: str,
    *,
    precision: str = "bf16",
    quick_gelu: Optional[bool] = None,
    force_image_size: Optional[int] = None,
    force_patch_dropout: Optional[float] = None,
    grad_checkpointing: bool = False,
    alpha: float = 0.5,
    init_logit_bias: Optional[float] = None,
    gelu_approximate: bool = False,
):
    """Build the model definition (uninitialized flax Module) + its config."""
    cfg_dict = get_model_config(model_name)
    if cfg_dict is None:
        raise RuntimeError(
            f"Model config for {model_name} not found; available: {list_models()}"
        )
    multimodal_dict = cfg_dict.pop("multimodal_cfg", None)
    cfg = CLIPCfg.from_dict(cfg_dict)
    if quick_gelu is not None:
        cfg = dataclasses.replace(cfg, quick_gelu=quick_gelu)
    if force_image_size is not None:
        cfg.vision_cfg.image_size = force_image_size
    if force_patch_dropout is not None:
        cfg.vision_cfg.patch_dropout = force_patch_dropout
    if init_logit_bias is not None:
        cfg = dataclasses.replace(cfg, init_logit_bias=init_logit_bias)
    cfg = dataclasses.replace(cfg, alpha=alpha, gelu_approximate=gelu_approximate)

    policy = PrecisionPolicy.from_precision(precision)
    if "coca" in model_name.lower():
        # CoCa branch (reference factory.py create_loss selects CoCaLoss on
        # the name; open_clip builds the CoCa class from multimodal_cfg)
        from .models.coca import CoCa, MultimodalCfg

        model = CoCa(
            cfg,
            multimodal_cfg=MultimodalCfg.from_dict(multimodal_dict or {}),
            dtype=policy.compute_dtype,
            param_dtype=policy.param_dtype,
            remat=grad_checkpointing,
        )
        return model, cfg
    model_cls = ColXLIP if "colxlip" in model_name.lower() else CLIP
    model = model_cls(
        cfg,
        dtype=policy.compute_dtype,
        param_dtype=policy.param_dtype,
        remat=grad_checkpointing,
    )
    return model, cfg


def init_params(model, cfg: CLIPCfg, seed: int = 0):
    h, w = (cfg.vision_cfg.image_size,) * 2 if isinstance(
        cfg.vision_cfg.image_size, int
    ) else cfg.vision_cfg.image_size
    images = jnp.zeros((1, h, w, 3), jnp.float32)
    texts = jnp.zeros((1, cfg.text_cfg.context_length), jnp.int32)
    texts = texts.at[:, 0].set(49406).at[:, 1].set(49407)
    return model.init(jax.random.PRNGKey(seed), images, texts)


def load_weights(
    model,
    cfg: CLIPCfg,
    checkpoint_path: str,
    *,
    seed: int = 0,
    model_name: str = "",
):
    """Initialize params then load a checkpoint (.pt or orbax) non-strictly.

    For colxlip models a plain-CLIP checkpoint loads the towers and leaves
    token heads at init (reference factory.py:318-341 tag-strip reuse).
    """
    from .training.checkpoint import load_native_checkpoint, load_pt_checkpoint

    if not os.path.exists(checkpoint_path):
        from .pretrained import QUICK_GELU_TAGS, resolve_pretrained

        if checkpoint_path in QUICK_GELU_TAGS and not cfg.quick_gelu:
            logger.warning(
                "pretrained tag %r was trained with QuickGELU but this model "
                "config has quick_gelu=False — pass quick_gelu=True "
                "(--force-quick-gelu) or activations will silently diverge "
                "from the checkpoint's (reference factory.py:256-266)",
                checkpoint_path)
        checkpoint_path = resolve_pretrained(model_name, checkpoint_path)
    params = init_params(model, cfg, seed)
    if checkpoint_path.endswith((".pt", ".pth", ".bin")):
        params = load_pt_checkpoint(
            checkpoint_path,
            expected_params=params,
            grid_size=cfg.vision_cfg.grid_size,
        )
        params = jax.tree.map(jnp.asarray, params)
    else:
        from .training.checkpoint import _merge_trees, resize_vision_pos_embed

        restored = load_native_checkpoint(checkpoint_path)
        state = restored.get("state", restored)
        loaded = state.get("params", state)
        if "params" not in loaded:
            loaded = {"params": loaded}
        # same non-strict semantics as the .pt branch: resize the visual pos
        # embed on image-size mismatch, and merge over the initialized tree
        # so a plain-CLIP orbax checkpoint leaves colxlip token heads at init
        if "visual" in loaded["params"]:
            loaded = resize_vision_pos_embed(loaded, cfg.vision_cfg.grid_size)
        merged = _merge_trees(
            jax.tree.map(lambda x: np.asarray(x), params), loaded)
        params = jax.tree.map(jnp.asarray, merged)
    return params


def create_model_and_transforms(
    model_name: str,
    pretrained: Optional[str] = None,
    *,
    precision: str = "bf16",
    quick_gelu: Optional[bool] = None,
    force_image_size: Optional[int] = None,
    force_patch_dropout: Optional[float] = None,
    grad_checkpointing: bool = False,
    alpha: float = 0.5,
    gelu_approximate: bool = False,
    image_mean: Optional[Tuple[float, ...]] = None,
    image_std: Optional[Tuple[float, ...]] = None,
    aug_cfg: Optional[AugmentationCfg] = None,
    seed: int = 0,
    normalize_on_device: bool = False,
    raw_aug: str = "rrc",
    ship: str = "rgb",
):
    """(model, cfg, params, preprocess_train, preprocess_val) —
    reference factory.py:367-421.

    image_mean/image_std default to the MODEL CONFIG's stats
    (vision_cfg.image_mean/std, OPENAI unless the JSON overrides them);
    passing them explicitly overrides both the host transform and the
    device-side normalization so the two always agree.

    normalize_on_device: the TRAIN transform emits raw uint8 RGB and the
    vision tower normalizes on the accelerator (models/vision.py) — 4x fewer
    host->device bytes per batch. ship='yuv420' goes further: train batches
    leave the host as planar YUV 4:2:0 (1.5 bytes/px, ops/yuv420.py) and the
    tower reconstructs normalized RGB on device.
    """
    model, cfg = create_model(
        model_name, precision=precision, quick_gelu=quick_gelu,
        force_image_size=force_image_size,
        force_patch_dropout=force_patch_dropout,
        grad_checkpointing=grad_checkpointing, alpha=alpha,
        gelu_approximate=gelu_approximate,
    )
    if image_mean is None:
        image_mean = tuple(cfg.vision_cfg.image_mean)
    if image_std is None:
        image_std = tuple(cfg.vision_cfg.image_std)
    if tuple(image_mean) != tuple(cfg.vision_cfg.image_mean) or (
        tuple(image_std) != tuple(cfg.vision_cfg.image_std)
    ):
        # explicit caller stats win; keep the device-side normalization in
        # sync with the host transform
        cfg = dataclasses.replace(
            cfg,
            vision_cfg=dataclasses.replace(
                cfg.vision_cfg, image_mean=tuple(image_mean),
                image_std=tuple(image_std)),
        )
        model = model.clone(cfg=cfg)
    if pretrained:
        params = load_weights(model, cfg, pretrained, seed=seed, model_name=model_name)
    else:
        params = init_params(model, cfg, seed)
    size = cfg.vision_cfg.image_size
    preprocess_train = image_transform(
        size, is_train=True, mean=image_mean, std=image_std, aug_cfg=aug_cfg,
        normalize_on_device=normalize_on_device, raw_aug=raw_aug, ship=ship,
    )
    # val inherits the uint8 device-normalize wire format (numerically
    # identical to the host float path — same fp32 op order on device) but
    # NOT yuv420: eval is parity-sensitive and chroma subsampling is lossy.
    # ship='yuv420' implies the uint8 val ship too — the recipes pass only
    # --ship-format and must not silently revert eval to float32
    preprocess_val = image_transform(
        size, is_train=False, mean=image_mean, std=image_std,
        normalize_on_device=normalize_on_device or ship == "yuv420")
    return model, cfg, params, preprocess_train, preprocess_val


def get_tokenizer(
    model_name: str = "", context_length: Optional[int] = None,
    require_merges: bool = False, **kwargs
) -> SimpleTokenizer:
    """Tokenizer for a registered model (reference factory.py:87-128).

    ``require_merges=True`` hard-fails when the real CLIP BPE merge table is
    absent — pass it whenever pretrained weights are in play, since the
    zero-merges fallback silently destroys text-side checkpoint parity.
    """
    cfg_dict = get_model_config(model_name) if model_name else None
    if context_length is None:
        if cfg_dict is not None:
            context_length = cfg_dict.get("text_cfg", {}).get("context_length", 77)
        else:
            context_length = 77
    return SimpleTokenizer(
        context_length=context_length, strict=require_merges, **kwargs)


def create_loss(args) -> TrainStepConfig:
    """Map driver args to the train-step loss config (factory.py:424-461):
    'coca' in model name -> CoCa contrastive+caption; --siglip -> SigLIP;
    'colxlip' in model name -> ColCLIP alpha-mix; distill pair -> KD;
    otherwise plain CLIP InfoNCE."""
    model_name = getattr(args, "model", "")
    if "coca" in model_name.lower():
        loss_type = "coca"
    elif getattr(args, "distill_model", None) and getattr(args, "distill_pretrained", None):
        loss_type = "distill"
    elif getattr(args, "siglip", False):
        loss_type = "siglip"
    elif "colxlip" in model_name.lower():
        loss_type = "colclip"
    else:
        loss_type = "clip"
    return TrainStepConfig(
        loss_type=loss_type,
        alpha=getattr(args, "alpha", 0.5),
        local_loss=getattr(args, "local_loss", False),
        gather_with_grad=getattr(args, "gather_with_grad", False),
        accum_freq=getattr(args, "accum_freq", 1),
        maxsim_impl=getattr(args, "maxsim_impl", "auto"),
        ce_impl=getattr(args, "ce_impl", "dense"),
        token_dist=getattr(args, "token_dist", "gather"),
        token_neighborhood=getattr(args, "token_neighborhood", 0),
        mask_mode=getattr(args, "token_mask_mode", "nonzero"),
        dist_impl=getattr(args, "dist_impl", None) or "bidir",
        coca_caption_loss_weight=getattr(args, "coca_caption_loss_weight", 2.0),
        coca_contrastive_loss_weight=getattr(
            args, "coca_contrastive_loss_weight", 1.0),
    )

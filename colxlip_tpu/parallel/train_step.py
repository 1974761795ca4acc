"""The sharded training step: forward, loss with ICI collectives, grads, update.

TPU-native redesign of the reference's hot loop (src/colxlip/train.py:93-270):
the whole step runs inside ``shard_map`` over the data mesh axis — params
replicated, batch sharded — so the loss's all-gather/ppermute collectives have
an explicit axis while XLA still fuses the towers. Gradients are ``pmean``'d
across the axis, which is exactly DDP's average-gradient semantics
(main.py:264-271) but emitted as one fused reduce by XLA.

Covered reference behaviors:
  - loss dispatch clip/colclip/siglip (factory.py:424-461)
  - gradient accumulation with cached-feature negative splicing
    (train.py:139-185): accum_freq microbatches are first encoded under
    stop_gradient, then each is re-encoded WITH gradients and spliced into
    the cached full-accumulation feature bank before the loss
  - logit_scale clamp to [0, ln(100)] after the update (train.py:211-212)
  - per-step LR schedule via optax schedule injection (main.py:338-348)
  - activation checkpointing comes from the model's ``remat`` flag
    (main.py:250-251 analog)

No GradScaler: bf16 on TPU needs no loss scaling (fp32 params/optimizer).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..losses import clip_loss, coca_loss, colclip_loss, distill_clip_loss, siglip_loss
from .mesh import DATA_AXIS

MAX_LOGIT_SCALE = math.log(100.0)


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    opt_state: Any


@dataclasses.dataclass(frozen=True)
class TrainStepConfig:
    loss_type: str = "colclip"            # 'clip' | 'colclip' | 'siglip'
    alpha: float = 0.5
    local_loss: bool = False
    gather_with_grad: bool = False
    accum_freq: int = 1
    maxsim_impl: str = "auto"
    ce_impl: str = "dense"          # 'fused' = Pallas streaming logsumexp CE
    token_dist: str = "gather"      # 'ring' = blockwise ppermute token loss
    token_neighborhood: int = 0     # >0: cap token-CE negatives to a
                                    # K-device ring neighborhood (pod-scale
                                    # FLOP mitigation; needs token_dist=ring)
    mask_mode: str = "nonzero"
    dist_impl: str = "bidir"              # siglip negative exchange
    clamp_logit_scale: bool = True
    # CoCa loss weights (reference params.py --coca-*-loss-weight defaults)
    coca_caption_loss_weight: float = 2.0
    coca_contrastive_loss_weight: float = 1.0


def compute_loss(out: Dict[str, jnp.ndarray], cfg: TrainStepConfig,
                 axis_name: Optional[str]) -> Dict[str, jnp.ndarray]:
    """Dispatch on loss type (reference factory.py:424-461 create_loss)."""
    if cfg.loss_type == "colclip":
        return colclip_loss(
            out["image_features"], out["text_features"],
            out["token_image_features"], out["token_text_features"],
            out["logit_scale"], alpha=cfg.alpha, axis_name=axis_name,
            local_loss=cfg.local_loss, gather_with_grad=cfg.gather_with_grad,
            logit_bias=out.get("logit_bias"), maxsim_impl=cfg.maxsim_impl,
            mask_mode=cfg.mask_mode, token_dist=cfg.token_dist,
            token_neighborhood=cfg.token_neighborhood,
            text_mask=out.get("text_mask"), output_dict=True,
        )
    if cfg.loss_type == "clip":
        total = clip_loss(
            out["image_features"], out["text_features"], out["logit_scale"],
            axis_name=axis_name, local_loss=cfg.local_loss,
            gather_with_grad=cfg.gather_with_grad,
            logit_bias=out.get("logit_bias"), ce_impl=cfg.ce_impl,
        )
        return {"total_loss": total}
    if cfg.loss_type == "coca":
        d = coca_loss(
            out["image_features"], out["text_features"], out["logits"],
            out["labels"], out["logit_scale"],
            caption_loss_weight=cfg.coca_caption_loss_weight,
            clip_loss_weight=cfg.coca_contrastive_loss_weight,
            axis_name=axis_name, local_loss=cfg.local_loss,
            gather_with_grad=cfg.gather_with_grad, output_dict=True,
            ce_impl=cfg.ce_impl,
            caption_hidden=out.get("caption_hidden"),
            caption_head_kernel=out.get("caption_head_kernel"),
        )
        return {
            "contrastive_loss": d["contrastive_loss"],
            "caption_loss": d["caption_loss"],
            "total_loss": d["contrastive_loss"] + d["caption_loss"],
        }
    if cfg.loss_type == "distill":
        contrastive, distill = distill_clip_loss(
            out["image_features"], out["text_features"], out["logit_scale"],
            out["dist_image_features"], out["dist_text_features"],
            out["dist_logit_scale"],
            axis_name=axis_name, local_loss=cfg.local_loss,
            gather_with_grad=cfg.gather_with_grad,
        )
        return {
            "contrastive_loss": contrastive,
            "distill_loss": distill,
            "total_loss": contrastive + distill,
        }
    if cfg.loss_type == "siglip":
        total = siglip_loss(
            out["image_features"], out["text_features"], out["logit_scale"],
            out.get("logit_bias"), axis_name=axis_name, dist_impl=cfg.dist_impl,
        )
        return {"total_loss": total}
    raise ValueError(f"unknown loss_type: {cfg.loss_type!r}")


def build_forward(model, cfg: TrainStepConfig,
                  teacher: Optional[Tuple[Any, Any]] = None):
    """forward(params, images, texts) -> model-output dict, shared by the
    shard_map and GSPMD steps so loss-relevant extras (the 'valid' text mask,
    stop-gradient teacher features for distillation) are computed identically
    on both paths."""
    teacher_model, teacher_params = teacher if teacher is not None else (None, None)

    def forward(params, images, texts, t_params=None):
        out = model.apply(params, images, texts, train=True)
        if teacher_model is not None:
            # t_params (per-call jit argument) overrides the closure default:
            # closing the jit over concrete teacher params embeds them as
            # constants in the serialized module — hundreds of MB at ViT
            # scale, which overflows the remote-compile request (the HTTP
            # 413 trap, docs/BENCH.md round-3)
            t_out = teacher_model.apply(
                teacher_params if t_params is None else t_params,
                images, texts)
            out = dict(out)
            out["dist_image_features"] = jax.lax.stop_gradient(t_out["image_features"])
            out["dist_text_features"] = jax.lax.stop_gradient(t_out["text_features"])
            out["dist_logit_scale"] = jax.lax.stop_gradient(t_out["logit_scale"])
        if cfg.mask_mode == "valid" and "token_text_features" in out:
            # validity mask matching the encoder's EOT zeroing: positions
            # strictly before argmax(EOT) are real text tokens
            eot = jnp.argmax(texts, axis=-1)
            out["text_mask"] = (
                jnp.arange(texts.shape[1])[None, :] < eot[:, None]
            ).astype(jnp.float32)
        return out

    return forward


def _clamp_logit_scale(params):
    def clamp(path, leaf):
        names = [getattr(k, "key", str(k)) for k in path]
        if names and names[-1] == "logit_scale":
            return jnp.clip(leaf, 0.0, MAX_LOGIT_SCALE)
        return leaf
    return jax.tree_util.tree_map_with_path(clamp, params)


def make_train_step(
    model,
    tx,
    cfg: TrainStepConfig,
    mesh: Optional[Mesh] = None,
    donate: bool = True,
    teacher: Optional[Tuple[Any, Any]] = None,
    packed_feed: Optional[Tuple[Tuple[int, ...], int]] = None,
):
    """Build the jitted train step fn(state, images, texts) -> (state, metrics).

    images: [B_local*world, H, W, 3] (global batch, sharded over 'data')
    texts:  [B, ctx] int32 (caption 0 already selected, train.py:122)
    teacher: (model, params) for loss_type='distill' — teacher features are
    computed under stop_gradient each step (reference DistillClipLoss usage).
    packed_feed: (per_sample_img_shape, ctx) — the step instead takes ONE
    fused [B, bytes] uint8 buffer (data_feed.pack_batch) and unpacks it
    in-jit: fn(state, buf) -> (state, metrics). One host->device transfer
    per step instead of two (each put carries a fixed per-call cost on
    PCIe/relay links).
    """
    axis_name = DATA_AXIS if mesh is not None else None
    teacher_model, teacher_params = (
        teacher if teacher is not None else (None, None))
    # build the forward WITHOUT closing over the teacher params — they are
    # threaded through the step as a jit argument (see build_forward note)
    forward = build_forward(
        model, cfg, (teacher_model, None) if teacher_model is not None
        else None)

    def loss_fn(params, images, texts, t_params=None):
        out = forward(params, images, texts, t_params)
        losses = compute_loss(out, cfg, axis_name)
        return losses["total_loss"], (losses, out["logit_scale"])

    def microbatched_loss_fn(params, images, texts, t_params=None):
        """Grad accumulation with cached-negative splicing (train.py:139-185).

        Pass 1: encode all accum_freq microbatches without gradients.
        Pass 2: for each microbatch j, re-encode with gradients, splice into
        the cached bank, compute the loss over the FULL accumulation, and sum
        the per-microbatch grads (torch accumulates via repeated backward).
        """
        n = cfg.accum_freq
        b = images.shape[0] // n
        im = images.reshape(n, b, *images.shape[1:])
        tx_ = texts.reshape(n, b, *texts.shape[1:])

        def encode(mb):
            out = forward(params, mb[0], mb[1], t_params)
            # cache every batch-dim output (the reference caches all model
            # outputs except the scalars, train.py:146-150) so coca logits/
            # labels and distill features splice too. Membership is decided
            # by KEY, not shape alone: caption_head_kernel is [D, V] and a
            # width-sized microbatch (b == D) would otherwise be spliced
            batched = {k: v for k, v in out.items()
                       if k not in _NON_BATCH_OUTPUTS
                       and hasattr(v, "ndim") and v.ndim >= 1
                       and v.shape[0] == b}
            scalars = {k: v for k, v in out.items() if k not in batched}
            return batched, scalars

        cached, scalars0 = jax.lax.map(lambda mb: encode(mb), (im, tx_))
        cached = jax.lax.stop_gradient(cached)
        logit_scale = jax.tree.map(lambda x: x[0], scalars0)["logit_scale"]

        def one_micro(j):
            def inner(params):
                out_j = forward(params, im[j], tx_[j], t_params)
                spliced = {}
                for k, bank in cached.items():
                    live = out_j[k]
                    full = jax.lax.dynamic_update_index_in_dim(bank, live, j, 0)
                    spliced[k] = full.reshape(n * b, *bank.shape[2:])
                for k, v in out_j.items():
                    if k not in spliced:
                        spliced[k] = v
                losses = compute_loss(spliced, cfg, axis_name)
                return losses["total_loss"], losses
            return jax.grad(inner, has_aux=True)(params)

        def scan_body(carry, j):
            g_acc = carry
            g_j, losses_j = one_micro(j)
            g_acc = jax.tree.map(jnp.add, g_acc, g_j)
            return g_acc, losses_j

        g0 = jax.tree.map(jnp.zeros_like, params)
        grads, losses_all = jax.lax.scan(scan_body, g0, jnp.arange(n))
        losses = jax.tree.map(lambda x: jnp.mean(x), losses_all)
        return grads, losses, logit_scale

    def per_device_step(state: TrainState, images, texts, t_params=None):
        if cfg.accum_freq > 1:
            grads, losses, logit_scale = microbatched_loss_fn(
                state.params, images, texts, t_params
            )
        else:
            (_, (losses, logit_scale)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params, images, texts, t_params)

        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            losses = jax.lax.pmean(losses, axis_name)

        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(
            lambda p, u: p + u, state.params, updates
        )
        if cfg.clamp_logit_scale:
            new_params = _clamp_logit_scale(new_params)
        metrics = dict(losses)
        metrics["logit_scale"] = logit_scale
        metrics["grad_norm"] = optax_global_norm(grads)
        return TrainState(state.step + 1, new_params, new_opt_state), metrics

    donate_idx = (0,) if donate else ()
    has_teacher = teacher_model is not None

    def _bind(jitted, packed=False):
        # teacher params ride as a per-call jit ARGUMENT (see build_forward
        # note) — bind them here so callers keep the documented
        # fn(state, images, texts) / fn(state, buf) signature
        if not has_teacher:
            return jitted
        if packed:
            return lambda state, buf: jitted(state, buf, teacher_params)
        return lambda state, images, texts: jitted(
            state, images, texts, teacher_params)

    if packed_feed is not None:
        from .data_feed import unpack_batch

        img_shape, ctx = packed_feed

        def packed_step(state: TrainState, buf, t_params=None):
            images, texts = unpack_batch(buf, img_shape, ctx)
            return per_device_step(state, images, texts, t_params)

        if mesh is None:
            return _bind(jax.jit(packed_step, donate_argnums=donate_idx),
                         packed=True)
        sharded_packed = shard_map(
            packed_step,
            mesh=mesh,
            in_specs=(P(), P(DATA_AXIS)) + ((P(),) if has_teacher else ()),
            out_specs=(P(), P()),
            check_vma=False,
        )
        return _bind(jax.jit(sharded_packed, donate_argnums=donate_idx),
                     packed=True)

    if mesh is None:
        return _bind(jax.jit(per_device_step, donate_argnums=donate_idx))

    state_spec = P()
    sharded = shard_map(
        per_device_step,
        mesh=mesh,
        in_specs=(state_spec, P(DATA_AXIS), P(DATA_AXIS))
        + ((P(),) if has_teacher else ()),
        out_specs=(state_spec, P()),
        check_vma=False,
    )
    return _bind(jax.jit(sharded, donate_argnums=donate_idx))


# model outputs that are parameters/scalars, never per-sample rows — the
# grad-accum splice must not cache them even when a leading dim happens to
# equal the microbatch size
_NON_BATCH_OUTPUTS = frozenset(
    {"logit_scale", "logit_bias", "dist_logit_scale", "caption_head_kernel"})


def optax_global_norm(grads) -> jnp.ndarray:
    # fp32-upcast wrapper over the optax primitive (bf16 squares underflow)
    import optax

    return optax.global_norm(
        jax.tree.map(lambda g: g.astype(jnp.float32), grads))


def init_train_state(model, tx, rng, example_images, example_texts) -> TrainState:
    params = model.init(rng, example_images, example_texts)
    opt_state = tx.init(params)
    return TrainState(jnp.zeros((), jnp.int32), params, opt_state)


def replicate_state(state: TrainState, mesh: Mesh) -> TrainState:
    """Place the state replicated over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), state)

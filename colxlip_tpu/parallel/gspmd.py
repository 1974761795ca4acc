"""GSPMD train step: jit-only sharding with optional tensor parallelism.

The idiomatic-XLA alternative to the explicit shard_map step
(parallel/train_step.py). Here the step is written with SINGLE-DEVICE
semantics over the GLOBAL batch; ``jit`` + ``NamedSharding`` annotations
partition it over the mesh and XLA inserts every collective:

  - batch axis sharded over 'data' (the reference's DDP, SURVEY.md §2.3)
  - Megatron-style weight sharding over 'model' (optional): QKV/c_fc kernels
    column-sharded, out_proj/c_proj row-sharded, embeddings/LN replicated —
    the "TP comes nearly free under pjit" item of SURVEY.md §2.3
  - the contrastive loss is computed on the global feature arrays; GSPMD
    shards the N x N logits and emits the all-gathers over ICI on its own
    (equivalent to the reference's full-mode gather_with_grad semantics;
    for the stop-gradient gather or explicit ring variants use the
    shard_map step)

``partition_params`` produces the PartitionSpec tree; everything else is a
thin jit wrapper.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, MODEL_AXIS
from .train_step import (
    TrainState,
    TrainStepConfig,
    _clamp_logit_scale,
    build_forward,
    compute_loss,
    optax_global_norm,
)


def validate_gspmd_config(cfg: TrainStepConfig) -> None:
    """Hard-error on configs the GSPMD step cannot express (VERDICT r2 #2:
    a silently-wrong --model-parallel run is worse than a refusal).

    The GSPMD step runs the loss with axis_name=None on GLOBAL arrays —
    full-mode differentiable-gather semantics. Explicit-collective modes
    (sharded-logits local_loss, the ppermute token ring, grad-accum feature
    splicing) are shard_map formulations; use data-parallel for those.
    """
    bad = []
    if cfg.local_loss:
        bad.append("--local-loss (sharded-logits form needs the explicit "
                   "shard_map axis)")
    if cfg.token_dist == "ring":
        bad.append("--token-dist ring (ppermute ring needs the explicit "
                   "shard_map axis)")
    if cfg.accum_freq > 1:
        bad.append("--accum-freq > 1 (cached-negative splicing is built on "
                   "the shard_map step)")
    if not cfg.gather_with_grad:
        # the GSPMD loss sees GLOBAL arrays: every negative carries gradient.
        # The reference's default stop-gradient-gathered negatives
        # (loss.py:80-90) are a per-rank notion only the explicit shard_map
        # axis can express — refusing beats silently changing optimization
        # semantics relative to the same flags on the dp step.
        bad.append("--gather-with-grad off (the GSPMD step always "
                   "differentiates through all gathered negatives; pass "
                   "--gather-with-grad, or use data-parallel for "
                   "stop-gradient semantics)")
    if bad:
        raise ValueError(
            "--model-parallel > 1 uses the GSPMD train step, which does not "
            "support: " + "; ".join(bad))


def _spec_for(path_names, leaf, model_axis: Optional[str]) -> P:
    """Megatron sharding rules keyed on the param-tree naming."""
    if model_axis is None or leaf.ndim < 2:
        return P()
    name = path_names[-1]
    parent = path_names[-2] if len(path_names) >= 2 else ""
    # column-parallel: activations gain a sharded feature dim
    if parent in ("in_proj", "c_fc", "q_proj", "k_proj", "v_proj") and name == "kernel":
        return P(None, model_axis)
    # row-parallel: contraction over the sharded dim, psum after
    if parent in ("out_proj", "c_proj") and name == "kernel":
        return P(model_axis, None)
    return P()


def _fsdp_extend(spec: P, shape, data_axis_size: int) -> P:
    """Add ZeRO-3-style parameter sharding over the data axis.

    Picks the LARGEST dim not already sharded (by the model axis) whose size
    divides over the data axis; leaves the spec unchanged when none does
    (small pos-embed dims like 197, scalars). XLA then stores each param /
    adam moment as a 1/dp shard per device and inserts the all-gather at
    use and the reduce-scatter on the gradient — the GSPMD rendering of the
    sharded-state memory scaling the torch world gets from FSDP/ZeRO (the
    reference's DDP, SURVEY §2.3, replicates state on every rank).
    """
    if data_axis_size <= 1 or not shape:
        return spec
    entries = list(spec) + [None] * (len(shape) - len(spec))
    cands = [i for i, (s, e) in enumerate(zip(shape, entries))
             if e is None and s >= data_axis_size and s % data_axis_size == 0]
    if not cands:
        return spec
    entries[max(cands, key=lambda i: shape[i])] = DATA_AXIS
    return P(*entries)


def partition_params(params, mesh: Mesh, fsdp: bool = False):
    """PartitionSpec tree for the model params over the mesh."""
    model_axis = MODEL_AXIS if MODEL_AXIS in mesh.axis_names else None
    data_size = dict(zip(mesh.axis_names, mesh.devices.shape)).get(DATA_AXIS, 1)

    def spec(path, leaf):
        names = [getattr(k, "key", str(k)) for k in path]
        s = _spec_for(names, leaf, model_axis)
        if fsdp:
            s = _fsdp_extend(s, leaf.shape, data_size)
        return s

    return jax.tree_util.tree_map_with_path(spec, params)


def shard_state(state: TrainState, mesh: Mesh,
                fsdp: bool = False) -> Tuple[TrainState, Any]:
    """Place params/opt state on the mesh per the partition rules.

    The adam moments in opt_state are param-shaped; they get the matching
    param's spec (matched by shape — optax state trees are not structurally
    identical to the param tree), everything else is replicated.
    """
    param_specs = partition_params(state.params, mesh, fsdp=fsdp)

    def place(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    new_params = jax.tree.map(place, state.params, param_specs)

    # Optimizer moments are matched to params by PATH SUFFIX (e.g. the adam
    # mu leaf at (0, mu, params, visual, ..., kernel) matches the param at
    # (params, visual, ..., kernel)) — shape-only matching would collide
    # same-shaped params with different specs (q_proj vs out_proj kernels).
    def path_names(path):
        return tuple(str(getattr(k, "key", getattr(k, "name", getattr(k, "idx", k))))
                     for k in path)

    spec_by_path = {}
    for (path, leaf), spec in zip(
        jax.tree_util.tree_flatten_with_path(state.params)[0],
        jax.tree.leaves(param_specs),
    ):
        spec_by_path[path_names(path)] = (spec, leaf.shape)

    def place_opt_leaf(path, x):
        names = path_names(path)
        shape = getattr(x, "shape", None)
        for start in range(len(names)):
            hit = spec_by_path.get(names[start:])
            if hit is not None and hit[1] == shape:
                return place(x, hit[0])
        return place(x, P())

    new_opt = jax.tree_util.tree_map_with_path(place_opt_leaf, state.opt_state)
    return TrainState(place(state.step, P()), new_params, new_opt), param_specs


def make_train_step_gspmd(
    model,
    tx,
    cfg: TrainStepConfig,
    mesh: Mesh,
    donate: bool = True,
    teacher: Optional[Tuple[Any, Any]] = None,
    fsdp: bool = False,
):
    """fn(state, images, texts) -> (state, metrics), GSPMD-partitioned.

    The loss runs with axis_name=None on global arrays — full-mode
    gather-with-grad semantics; XLA inserts the collectives. The returned
    callable enters the mesh context itself, so callers (the driver epoch
    loop) need no ``set_mesh`` wrapping.

    ``fsdp=True`` constrains the UPDATED params back onto the ZeRO-3 specs
    (``partition_params(fsdp=True)``): without the output constraint XLA is
    free to keep the post-update params fully gathered, silently forfeiting
    the sharded-state memory win on the next step. Pair with
    ``shard_state(..., fsdp=True)`` so the incoming state matches.
    """
    validate_gspmd_config(cfg)
    teacher_model, teacher_params = (
        teacher if teacher is not None else (None, None))
    # teacher params ride as a jit ARGUMENT, not a closure constant (the
    # HTTP-413 remote-compile trap at ViT scale; see build_forward note)
    forward = build_forward(
        model, cfg, (teacher_model, None) if teacher_model is not None
        else None)

    def step(state: TrainState, images, texts, t_params=None):
        images = jax.lax.with_sharding_constraint(
            images, NamedSharding(mesh, P(DATA_AXIS))
        )
        texts = jax.lax.with_sharding_constraint(
            texts, NamedSharding(mesh, P(DATA_AXIS))
        )

        def loss_fn(params):
            out = forward(params, images, texts, t_params)
            losses = compute_loss(out, cfg, None)
            return losses["total_loss"], (losses, out["logit_scale"])

        (_, (losses, logit_scale)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        if cfg.clamp_logit_scale:
            new_params = _clamp_logit_scale(new_params)
        if fsdp:
            specs = partition_params(new_params, mesh, fsdp=True)
            new_params = jax.tree.map(
                lambda x, s: jax.lax.with_sharding_constraint(
                    x, NamedSharding(mesh, s)),
                new_params, specs)
        metrics = dict(losses)
        metrics["logit_scale"] = logit_scale
        metrics["grad_norm"] = optax_global_norm(grads)
        return TrainState(state.step + 1, new_params, new_opt_state), metrics

    jitted = jax.jit(step, donate_argnums=(0,) if donate else ())

    def call(state, images, texts):
        with jax.sharding.set_mesh(mesh):
            if teacher_model is not None:
                return jitted(state, images, texts, teacher_params)
            return jitted(state, images, texts)

    return call

"""Experiment driver: the ``python -m colxlip_tpu.main`` entry point.

Counterpart of reference src/main.py:79-479: experiment naming, logging,
resume-latest discovery, model/optimizer construction, data, the epoch loop
with eval + checkpoint save/rotate, remote sync, eval-only mode.
"""
from __future__ import annotations

import logging
import os
import sys
import time
from datetime import datetime
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from .data.retrieval import RetrievalSuite, build_retrieval_suite
from .data.transforms import AugmentationCfg
from .data.synthetic import SyntheticConfig, SyntheticDataset
from .data.wds import SharedEpoch, WdsConfig, WdsTrainPipeline
from .factory import create_loss, create_model_and_transforms, get_tokenizer
from .parallel.mesh import create_mesh, initialize_multihost
from .parallel.train_step import (
    TrainState,
    init_train_state,
    make_train_step,
    replicate_state,
)
from .training.checkpoint import (
    get_latest_checkpoint,
    get_latest_checkpoint_remote,
    load_native_checkpoint,
    read_step_in_epoch,
    restore_sharded_checkpoint,
    rotate_checkpoints,
    save_checkpoint,
    save_checkpoint_async,
    save_checkpoint_sharded,
    state_fully_addressable,
    wait_for_saves,
)
from .training.evaluate import evaluate
from .training.logging_utils import MetricsWriter, dump_params, setup_logging
from .training.optim import create_optimizer
from .training.schedules import const_lr, const_lr_cooldown, cosine_lr
from .training.train import train_one_epoch
from .params import parse_args
from .utils.file_utils import remote_sync, remote_sync_pull, start_sync_process

logger = logging.getLogger(__name__)

LATEST_CHECKPOINT_NAME = "epoch_latest"


def _broadcast_str(value: str, max_len: int = 512) -> str:
    """Broadcast a string from process 0 to all hosts (no-op single-host)."""
    if jax.process_count() == 1:
        return value
    from jax.experimental import multihost_utils

    buf = np.zeros((max_len,), np.uint8)
    raw = value.encode()[:max_len]
    buf[: len(raw)] = np.frombuffer(raw, np.uint8)
    out = multihost_utils.broadcast_one_to_all(buf)
    return bytes(np.asarray(out)).rstrip(b"\x00").decode()


def copy_codebase(args) -> None:
    """Snapshot the package source into the experiment dir (main.py:461-477)."""
    import shutil

    new_code_path = os.path.join(args.logs, args.name, "code")
    if os.path.exists(new_code_path):
        logger.error("Error: experiment code dir %s already exists", new_code_path)
        return
    logger.info("Copying codebase to %s", new_code_path)
    current_code_path = os.path.dirname(os.path.realpath(__file__))
    shutil.copytree(
        current_code_path, os.path.join(new_code_path, "colxlip_tpu"),
        ignore=shutil.ignore_patterns("__pycache__", "*.pyc", "logs", "wandb"),
    )


def generate_name(args) -> str:
    """Auto experiment name (reference main.py:92-107)."""
    date_str = datetime.now().strftime("%Y_%m_%d-%H_%M_%S")
    model_name_safe = args.model.replace("/", "-")
    return "-".join([
        date_str,
        f"model_{model_name_safe}",
        f"lr_{args.lr}",
        f"b_{args.batch_size}",
        f"p_{args.precision}",
    ])


def build_retrieval_suites(args, tokenizer, preprocess_val) -> List[RetrievalSuite]:
    suites = []

    def add(flag, name, reader_args):
        if flag and all(v is not None for v in reader_args.values()):
            try:
                suites.append(build_retrieval_suite(name, reader_args, tokenizer, preprocess_val))
            except (OSError, KeyError) as e:
                logger.warning("skipping retrieval suite %s: %s", name, e)

    add(args.retrieval_coco, "coco", {"root_dir": args.coco_data_root_dir, "split": "val"})
    add(args.retrieval_flickr, "flickr",
        {"root_dir": args.flickr_data_root_dir, "split": args.flickr_val_or_test})
    add(args.retrieval_docci, "docci", {"root_dir": args.docci_data_root_dir})
    add(args.retrieval_urban_1k, "urban_1k", {"root_dir": args.urban_1k_data_root_dir})
    add(args.retrieval_dci, "dci", {"root_dir": args.dci_data_root_dir})
    add(args.retrieval_iiw, "iiw",
        {"root_dir": args.iiw_data_root_dir, "finegrained": args.iiw_finegrained})
    add(args.retrieval_sharegpt4v and args.sharegpt4v_json_1k is not None,
        "sharegpt4v-1k",
        {"root_dir": args.sharegpt4v_data_root_dir, "json_name": args.sharegpt4v_json_1k})
    add(args.retrieval_sharegpt4v and args.sharegpt4v_json_10k is not None,
        "sharegpt4v-10k",
        {"root_dir": args.sharegpt4v_data_root_dir, "json_name": args.sharegpt4v_json_10k})
    return suites


def build_lr_schedule(args, total_steps: int):
    if args.lr_scheduler == "cosine":
        return cosine_lr(args.lr, args.warmup, total_steps)
    if args.lr_scheduler == "const":
        return const_lr(args.lr, args.warmup)
    if args.lr_scheduler == "const-cooldown":
        cooldown_steps = (args.epochs_cooldown or 0) * max(
            total_steps // max(args.epochs, 1), 1
        )
        return const_lr_cooldown(
            args.lr, args.warmup, total_steps, cooldown_steps,
            args.lr_cooldown_power, args.lr_cooldown_end,
        )
    raise ValueError(f"Unknown scheduler {args.lr_scheduler}")


def main(argv=None) -> int:
    args = parse_args(argv)
    if args.pipeline == "grain":
        import grain  # noqa: F401  fail fast, before any model/TPU work

    # Persistent compile cache: TPU backends compile remotely (minutes for a
    # full train step); the cache makes re-runs of an unchanged step instant.
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR",
                                     os.path.expanduser("~/.jax_cache")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    initialize_multihost(args.dist_coordinator, args.dist_num_processes,
                         args.dist_process_id)
    is_master = jax.process_index() == 0
    num_devices = jax.device_count()

    if args.name is None:
        # rank-0 chooses the timestamped name; broadcast so all hosts agree
        # (reference main.py:99 broadcast_object of date_str)
        args.name = _broadcast_str(generate_name(args))

    log_base = os.path.join(args.logs, args.name)
    checkpoint_dir = os.path.join(log_base, "checkpoints")
    if is_master:
        os.makedirs(checkpoint_dir, exist_ok=True)
    log_path = None
    if is_master:
        log_path = os.path.join(log_base, "out.log")
    elif args.log_local:
        # per-rank logs on worker hosts (reference open_clip_train.logger
        # --log-local semantics)
        os.makedirs(log_base, exist_ok=True)
        log_path = os.path.join(log_base, f"out-{jax.process_index()}.log")
    setup_logging(log_path, logging.DEBUG if args.debug else logging.INFO)
    if is_master:
        dump_params(args, os.path.join(log_base, "params.txt"))
        if args.copy_codebase:
            copy_codebase(args)
    logger.info("Running with %d device(s) on %d process(es).",
                num_devices, jax.process_count())

    # resume-latest discovery (reference main.py:138-170); rank 0 discovers
    # and broadcasts so a checkpoint landing mid-discovery on a shared FS
    # can't split the hosts (the reference's master-only + broadcast
    # mitigation, main.py:150-170)
    resume_from = None
    if args.resume == "latest":
        if args.remote_sync:
            # with remote sync the REMOTE checkpoints dir is authoritative
            # (a fresh host has an empty local dir) — reference main.py:
            # 141-149 incl. both hard constraints
            if args.save_most_recent:
                logger.error(
                    "Cannot use save-most-recent with remote_sync and "
                    "resume latest.")
                return 1
            if args.remote_sync_protocol != "s3":
                logger.error(
                    "Sync protocol not supported when using resume latest.")
                return 1
            remote_ckpts = os.path.join(args.remote_sync, args.name,
                                        "checkpoints")
            found = (get_latest_checkpoint_remote(remote_ckpts)
                     if is_master else "")
            found = _broadcast_str(found or "") or None
            if found:
                # orbax restores from local paths: pull the one checkpoint
                # down before restore (each host needs its own copy)
                local = os.path.join(checkpoint_dir, os.path.basename(found))
                if not remote_sync_pull(found, local):
                    logger.error("failed to fetch remote checkpoint %s", found)
                    return 1
                resume_from = local
        else:
            found = get_latest_checkpoint(checkpoint_dir) if is_master else ""
            resume_from = _broadcast_str(found or "") or None
        if resume_from:
            logger.info("Found latest checkpoint: %s", resume_from)
    elif args.resume:
        resume_from = args.resume

    # remote sync (reference main.py:176-196)
    sync_thread = None
    if args.remote_sync and is_master:
        if not remote_sync(log_base, os.path.join(args.remote_sync, args.name),
                           args.remote_sync_protocol):
            logger.error("Error: remote sync failed from startup")
            return 1
        sync_thread = start_sync_process(
            args.remote_sync_frequency, log_base,
            os.path.join(args.remote_sync, args.name), args.remote_sync_protocol,
        )

    # Pretrained checkpoints demand bit-compatible BPE tokenization; the
    # zero-merges fallback would silently destroy text-side parity, so it is
    # a hard error here — before any model work (escape hatch:
    # --allow-degraded-tokenizer). A ``.pt`` resume is a reference-ecosystem
    # checkpoint and gets the same guard; orbax resumes are self-consistent
    # with whatever tokenizer trained them.
    needs_parity_tokenizer = bool(args.pretrained) or bool(
        resume_from and resume_from.endswith(".pt"))
    tokenizer = get_tokenizer(
        args.model,
        require_merges=needs_parity_tokenizer and not args.allow_degraded_tokenizer,
    )
    # --text-ctx: train-time data-side context override (the text tower
    # slices its positional embedding to the input length, so the params and
    # every eval path keep the config's full context). EOT lands inside the
    # window (the tokenizer truncates with EOT forced into the last slot),
    # which the EOT-zeroing + argmax pooling invariants require.
    train_ctx = args.text_ctx or 0
    if train_ctx:
        if not 3 <= train_ctx <= tokenizer.context_length:
            logger.error("--text-ctx %d must be in [3, %d] (the model's "
                         "context)", train_ctx, tokenizer.context_length)
            return 1
        train_tokenizer = get_tokenizer(
            args.model, context_length=train_ctx,
            require_merges=needs_parity_tokenizer
            and not args.allow_degraded_tokenizer,
        )
        logger.info("Train text context: %d (eval keeps %d)",
                    train_ctx, tokenizer.context_length)
    else:
        train_tokenizer = tokenizer

    # model + transforms
    model, cfg, params, preprocess_train, preprocess_val = create_model_and_transforms(
        args.model,
        pretrained=args.pretrained or None,
        precision=args.precision,
        quick_gelu=True if args.force_quick_gelu else None,
        force_image_size=args.force_image_size,
        force_patch_dropout=args.force_patch_dropout,
        grad_checkpointing=args.grad_checkpointing,
        alpha=args.alpha,
        gelu_approximate=args.gelu_approx,
        image_mean=tuple(args.image_mean) if args.image_mean else None,
        image_std=tuple(args.image_std) if args.image_std else None,
        aug_cfg=AugmentationCfg.from_kwargs(args.aug_cfg) if args.aug_cfg else None,
        seed=args.seed,
        normalize_on_device=args.normalize_on_device,
        raw_aug=args.raw_aug,
        ship=args.ship_format,
    )
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    logger.info("Model: %s (%.1fM params)", args.model, n_params / 1e6)

    suites = build_retrieval_suites(args, tokenizer, preprocess_val)

    # zero-shot ImageNet hook (reference train.py:279-281)
    zero_shot_fn = None
    if args.imagenet_val:
        from .training.zero_shot import zero_shot_eval

        def zero_shot_fn(m, p):  # noqa: E306
            return zero_shot_eval(m, p, tokenizer, preprocess_val,
                                  args.imagenet_val, batch_size=args.batch_size,
                                  classnames_path=args.imagenet_classnames)

    # eval-only mode (reference main.py:390-396)
    if not args.train_data and args.dataset_type != "synthetic":
        if not suites and zero_shot_fn is None:
            logger.error("eval-only mode but no retrieval suites configured")
            return 1
        evaluate(
            model, params, suites, epoch=0, batch_size=args.batch_size,
            scoring=args.eval_scoring, alpha=args.alpha,
            results_file=os.path.join(checkpoint_dir, "results.jsonl"),
            zero_shot_fn=zero_shot_fn,
            maxsim_impl=args.maxsim_impl, mask_mode=args.token_mask_mode,
        )
        return 0

    # data: each host's pipeline yields a LOCAL batch; the feeder assembles
    # the global sharded array (parallel/data_feed.py).
    # --batch-size is per DATA-PARALLEL group: with --model-parallel mp each
    # group of mp chips shares one batch shard, so the global batch scales
    # with the data-axis size, NOT the chip count (a 2x2x... mesh replicating
    # work along 'model' must not inflate the batch — VERDICT r2 #2).
    mp = args.model_parallel
    if mp > 1 and num_devices % mp != 0:
        logger.error("--model-parallel %d does not divide the %d devices",
                     mp, num_devices)
        return 1
    data_devices = num_devices // mp
    global_batch = args.batch_size * data_devices
    if global_batch % jax.process_count() != 0:
        logger.error("global batch %d does not split over %d host processes",
                     global_batch, jax.process_count())
        return 1
    host_batch = global_batch // jax.process_count()
    shared_epoch = SharedEpoch(0)
    if args.dataset_type == "synthetic" or not args.train_data:
        num_samples = args.train_num_samples or global_batch * 100
        h = cfg.vision_cfg.image_size
        h = h if isinstance(h, int) else h[0]
        train_data = SyntheticDataset(SyntheticConfig(
            batch_size=host_batch, image_size=(h, h),
            context_length=train_ctx or cfg.text_cfg.context_length,
            num_sampled_captions=args.num_sampled_captions,
            seed=args.seed, num_samples=num_samples,
            rank=jax.process_index(), world_size=jax.process_count(),
        ))
        num_batches = len(train_data)
    else:
        # The train step consumes ONLY caption 0 of the k sampled per image
        # (select_caption0; reference train.py:122 discards the rest). Each
        # of the k diverse-sampling draws is i.i.d., so drawing 1 gives
        # caption 0 the identical distribution while skipping k-1 wasted
        # sampling+tokenization passes per sample — measured 5x host-feed
        # throughput at the k=8 default (docs/BENCH.md round-4 feed section).
        wds_cfg = WdsConfig(
            urls=args.train_data,
            weights=args.train_data_upsampling_factors,
            batch_size=host_batch,
            num_samples=args.train_num_samples,
            resampled=args.dataset_resampled,
            seed=args.seed,
            num_workers=args.workers,
            num_sampled_captions=1,
            max_merged_num=args.max_merged_num,
            pixelprose=args.pixelprose,
            native_decode=args.native_decode,
            decode_threads=args.decode_threads,
            rank=jax.process_index(),
            world_size=jax.process_count(),
        )
        if args.pipeline == "grain":
            from .data.grain_pipeline import GrainTrainPipeline

            train_data = GrainTrainPipeline(wds_cfg, preprocess_train, train_tokenizer, shared_epoch)
        else:
            train_data = WdsTrainPipeline(wds_cfg, preprocess_train, train_tokenizer, shared_epoch)
        num_batches = train_data.num_batches or 1000
    steps_per_epoch = args.steps_per_epoch or num_batches
    total_steps = steps_per_epoch * args.epochs

    # optimizer + schedule + train step
    lr_schedule = build_lr_schedule(args, total_steps)
    tx = create_optimizer(
        lr_schedule if not args.skip_scheduler else args.lr,
        beta1=args.beta1, beta2=args.beta2, eps=args.eps,
        weight_decay=args.wd, grad_clip_norm=args.grad_clip_norm,
        lock_image=args.lock_image, lock_text=args.lock_text,
    )
    mesh = create_mesh(model_parallel=mp) if num_devices > 1 else None
    from .parallel.data_feed import DeviceFeeder

    packed_spec = None
    if args.packed_feed:
        if mp > 1 or args.fsdp:
            logger.error("--packed-feed is only supported on the plain "
                         "data-parallel step (not --model-parallel/--fsdp)")
            return 1
        if not (args.normalize_on_device or args.ship_format == "yuv420"):
            logger.error("--packed-feed requires a uint8 wire format: add "
                         "--normalize-on-device or --ship-format yuv420")
            return 1
        if args.dataset_type == "synthetic" or not args.train_data:
            # the synthetic pipeline emits float32 batches regardless of the
            # wire-format flags — fail here, not at the first train step
            # after minutes of remote compile
            logger.error("--packed-feed requires the webdataset pipeline "
                         "(the synthetic dataset emits float32 batches)")
            return 1
        h, w = preprocess_train.cfg.size_hw
        if args.ship_format == "yuv420":
            from .ops.yuv420 import yuv420_rows

            img_shape = (yuv420_rows(h), w)
        else:
            img_shape = (h, w, 3)
        packed_spec = (img_shape, train_ctx or cfg.text_cfg.context_length)
        logger.info("Packed feed: one %s+texts buffer per step", img_shape)
    feeder = DeviceFeeder(mesh, packed=packed_spec is not None)
    loss_cfg = create_loss(args)
    teacher = None
    if loss_cfg.loss_type == "distill":
        from .factory import create_model as _create_model, load_weights as _load_weights

        t_model, t_cfg = _create_model(args.distill_model, precision=args.precision)
        t_params = _load_weights(t_model, t_cfg, args.distill_pretrained, seed=args.seed)
        teacher = (t_model, t_params)
        logger.info("Distilling from %s (%s)", args.distill_model, args.distill_pretrained)
    if args.fsdp and (mesh is None or data_devices < 2):
        logger.error("--fsdp shards state over the data axis and needs a "
                     "multi-device mesh with data size >= 2 (have %d device"
                     "(s), data axis %d)", num_devices, data_devices)
        return 1
    if mp > 1 or args.fsdp:
        # GSPMD step: Megatron weight sharding over the 'model' axis and/or
        # ZeRO-3 param+opt sharding over the 'data' axis (parallel/gspmd.py).
        # Configs the GSPMD step cannot express hard-error inside
        # make_train_step_gspmd.
        from .parallel.gspmd import make_train_step_gspmd

        try:
            step_fn = make_train_step_gspmd(model, tx, loss_cfg, mesh,
                                            teacher=teacher, fsdp=args.fsdp)
        except ValueError as e:
            logger.error("%s", e)
            return 1
        logger.info("GSPMD step: tp=%d x dp=%d%s", mp, data_devices,
                    " + fsdp" if args.fsdp else "")
    else:
        step_fn = make_train_step(model, tx, loss_cfg, mesh=mesh,
                                  teacher=teacher, packed_feed=packed_spec)

    state = TrainState(jnp.zeros((), jnp.int32), params, tx.init(params))
    start_epoch = 0
    resume_step_in_epoch = 0
    # FSDP/TP on a multi-host mesh shards state ACROSS processes: restore
    # must happen after placement (each process reads only its own shard
    # bytes via restore_sharded_checkpoint); every other combination
    # restores host numpy first, then places.
    cross_process_state = jax.process_count() > 1 and (mp > 1 or args.fsdp)
    if resume_from and not cross_process_state:
        restored = load_native_checkpoint(resume_from, template=state._asdict())
        start_epoch = int(restored["epoch"])
        resume_step_in_epoch = read_step_in_epoch(resume_from)
        s = restored["state"]
        state = jax.tree.map(jnp.asarray, TrainState(s["step"], s["params"], s["opt_state"]))
        logger.info("=> resuming checkpoint '%s' (epoch %d%s)", resume_from,
                    start_epoch,
                    f", step {resume_step_in_epoch}" if resume_step_in_epoch
                    else "")
    if mesh is not None and (mp > 1 or args.fsdp):
        from .parallel.gspmd import shard_state

        state, _ = shard_state(state, mesh, fsdp=args.fsdp)
    elif mesh is not None:
        state = replicate_state(state, mesh)
    if resume_from and cross_process_state:
        restored = restore_sharded_checkpoint(resume_from, state._asdict())
        start_epoch = int(restored["epoch"])
        resume_step_in_epoch = read_step_in_epoch(resume_from)
        s = restored["state"]
        state = TrainState(s["step"], s["params"], s["opt_state"])
        logger.info("=> resumed sharded checkpoint '%s' (epoch %d%s)",
                    resume_from, start_epoch,
                    f", step {resume_step_in_epoch}" if resume_step_in_epoch
                    else "")
    state_addressable = state_fully_addressable(state)

    writer = MetricsWriter(
        log_base, args.report_to,
        wandb_project=args.wandb_project_name, wandb_notes=args.wandb_notes,
        run_name=args.name, resume=resume_from is not None,
        config=vars(args),
    ) if is_master else None

    # preemption hook: the TPU maintenance-event / SLURM grace-period signal
    # sets a flag; the epoch loop stops at a step boundary (cross-host
    # consensus), saves a mid-epoch epoch_latest and exits 0. The reference
    # has no equivalent — its recovery story is "resubmit with --resume
    # latest" at whole-epoch granularity (SURVEY §5).
    stop_event = None
    if args.preempt_save:
        import signal
        import threading

        stop_event = threading.Event()

        def _on_preempt(signum, frame):  # noqa: ARG001 — signal API shape
            logger.warning("received signal %d: will checkpoint and exit at "
                           "the next step boundary", signum)
            stop_event.set()

        for sig in (signal.SIGTERM, signal.SIGUSR1):
            signal.signal(sig, _on_preempt)

    for epoch in range(start_epoch, args.epochs):
        logger.info("Start epoch %d", epoch)
        if hasattr(train_data, "set_epoch"):
            train_data.set_epoch(epoch)
        skip = resume_step_in_epoch if epoch == start_epoch else 0
        t0 = time.perf_counter()
        state, steps, stopped = train_one_epoch(
            step_fn, state, iter(train_data), feeder=feeder,
            epoch=epoch, global_batch_size=global_batch,
            num_devices=num_devices,
            log_every_n_steps=args.log_every_n_steps,
            writer=writer, steps_per_epoch=steps_per_epoch,
            lr_schedule=lr_schedule,
            profiler_dir=args.profile_dir if epoch == start_epoch else None,
            skip_steps=skip, stop_flag=stop_event,
            stop_check_every=args.preempt_check_every,
            prefetch_depth=args.prefetch_depth,
        )
        if stopped:
            step_done = skip + steps
            logger.info("Preempted in epoch %d after step %d/%d: saving "
                        "mid-epoch checkpoint", epoch, step_done,
                        steps_per_epoch)
            wait_for_saves()  # don't race an in-flight async epoch save
            if not state_addressable:
                # cross-process-sharded state: every process writes its shards
                save_checkpoint_sharded(
                    checkpoint_dir, state._asdict(), epoch=epoch,
                    name=args.name, most_recent=True, step_in_epoch=step_done)
            elif is_master:
                save_checkpoint(
                    checkpoint_dir, jax.device_get(state)._asdict(),
                    epoch=epoch, name=args.name, most_recent=True,
                    step_in_epoch=step_done)
            break
        logger.info("Epoch %d done: %d steps in %.1fs", epoch, steps,
                    time.perf_counter() - t0)
        completed_epoch = epoch + 1

        if (suites or zero_shot_fn is not None) and (
            (args.val_frequency > 0 and completed_epoch % args.val_frequency == 0)
            or completed_epoch == args.epochs
        ):
            # params stay on device: the Encoder re-places them on the local
            # eval mesh itself, and a device_get round trip costs minutes at
            # the relay's ~14 MB/s for ViT-L-size states. Cross-process-
            # sharded (FSDP/TP multi-host) params must first be gathered to
            # host — a collective, so ALL processes call it; only the master
            # then runs the eval.
            eval_params = state.params
            if not state_addressable:
                from jax.experimental import multihost_utils

                # tiled=True: for a global (cross-process) array this
                # returns the assembled GLOBAL value on every host
                eval_params = multihost_utils.process_allgather(
                    state.params, tiled=True)
            if is_master:
                zs = zero_shot_fn if (
                    zero_shot_fn is not None
                    and args.zeroshot_frequency > 0
                    and completed_epoch % args.zeroshot_frequency == 0
                ) else None
                evaluate(
                    model, eval_params, suites,
                    epoch=completed_epoch, batch_size=args.batch_size,
                    scoring=args.eval_scoring, alpha=args.alpha,
                    results_file=os.path.join(checkpoint_dir, "results.jsonl"),
                    zero_shot_fn=zs,
                    maxsim_impl=args.maxsim_impl,
                    mask_mode=args.token_mask_mode,
                )
            del eval_params

        do_numbered = is_master and args.save_frequency > 0 and (
            completed_epoch % args.save_frequency == 0 or completed_epoch == args.epochs
        )
        if not state_addressable:
            # distributed save of cross-process-sharded state: EVERY process
            # participates (each writes only its own shard bytes; no host
            # ever holds the full ZeRO/TP state). --async-checkpoint runs
            # the TensorStore write in the background (donation-safe: the
            # call returns after the device->host shard copy).
            want_numbered = args.save_frequency > 0 and (
                completed_epoch % args.save_frequency == 0
                or completed_epoch == args.epochs)
            if want_numbered:
                save_checkpoint_sharded(
                    checkpoint_dir, state._asdict(),
                    epoch=completed_epoch, name=args.name,
                    background=args.async_checkpoint,
                    rotate_keep_epoch=(completed_epoch
                                       if args.delete_previous_checkpoint
                                       else None))
            if args.save_most_recent:
                save_checkpoint_sharded(checkpoint_dir, state._asdict(),
                                        epoch=completed_epoch, name=args.name,
                                        most_recent=True,
                                        background=args.async_checkpoint)
        elif args.async_checkpoint and is_master and (
            do_numbered or args.save_most_recent
        ):
            # one snapshot feeds both the numbered and latest writes; the
            # orbax serialize/write/rotate overlap the next epoch
            save_checkpoint_async(
                checkpoint_dir, state._asdict(), epoch=completed_epoch,
                name=args.name,
                most_recent=not do_numbered,
                also_most_recent=do_numbered and args.save_most_recent,
                rotate_keep_epoch=(completed_epoch
                                   if do_numbered and args.delete_previous_checkpoint
                                   else None))
        elif is_master and (do_numbered or args.save_most_recent):
            host_state = jax.device_get(state)._asdict()
            if do_numbered:
                save_checkpoint(checkpoint_dir, host_state,
                                epoch=completed_epoch, name=args.name)
                if args.delete_previous_checkpoint:
                    rotate_checkpoints(checkpoint_dir, completed_epoch)
            if args.save_most_recent:
                save_checkpoint(checkpoint_dir, host_state,
                                epoch=completed_epoch, name=args.name,
                                most_recent=True)

    wait_for_saves()
    if sync_thread is not None:
        sync_thread.stop_event.set()
        remote_sync(log_base, os.path.join(args.remote_sync, args.name),
                    args.remote_sync_protocol)
    if writer:
        writer.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Host-side epoch loop: feed batches to the jitted train step, log throughput.

Counterpart of reference ``train_one_epoch`` (src/colxlip/train.py:93-270):
per-step LR comes from the optax schedule compiled into the step; the loop
keeps the reference's meters (data_time, batch_time, samples/s and
samples/s/device, train.py:236-243), caption-0 selection (train.py:122), and
periodic logging. Device feeding overlaps host decode with device compute via
jax's async dispatch (no explicit prefetch thread needed for a first cut: the
jitted step call returns before the device finishes).
"""
from __future__ import annotations

import logging
import time
from typing import Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .logging_utils import AverageMeter, MetricsWriter

logger = logging.getLogger(__name__)


def select_caption0(texts: np.ndarray) -> np.ndarray:
    """[B, k, ctx] -> [B, ctx]: keep sampled caption 0 (train.py:122)."""
    if texts.ndim == 3:
        return texts[:, 0]
    return texts


def train_one_epoch(
    step_fn,
    state,
    dataloader: Iterable,
    *,
    epoch: int,
    global_batch_size: int,
    num_devices: int = 1,
    log_every_n_steps: int = 100,
    writer: Optional[MetricsWriter] = None,
    steps_per_epoch: Optional[int] = None,
    lr_schedule=None,
    profiler_dir: Optional[str] = None,
    feeder=None,
):
    """Run one epoch; returns (state, steps_run)."""
    batch_time_m = AverageMeter()
    data_time_m = AverageMeter()
    loss_meters: Dict[str, AverageMeter] = {}

    end = time.perf_counter()
    steps_run = 0
    metrics = {}
    for i, (images, texts) in enumerate(dataloader):
        if steps_per_epoch is not None and i >= steps_per_epoch:
            break
        texts = select_caption0(np.asarray(texts))
        if feeder is not None:
            images, texts = feeder(np.asarray(images, np.float32), texts)
        data_time_m.update(time.perf_counter() - end)

        if profiler_dir and i == 2:
            jax.profiler.start_trace(profiler_dir)
        state, metrics = step_fn(state, jnp.asarray(images), jnp.asarray(texts))  # noqa: E501  (feeder outputs pass through asarray unchanged)
        if profiler_dir and i == 4:
            jax.block_until_ready(metrics["total_loss"])
            jax.profiler.stop_trace()

        steps_run += 1
        step_idx = int(jax.device_get(state.step))

        if (i % log_every_n_steps) == 0 or (
            steps_per_epoch is not None and i == steps_per_epoch - 1
        ):
            # sync point: materialize metrics
            host_metrics = {k: float(jax.device_get(v)) for k, v in metrics.items()}
            batch_time_m.update(time.perf_counter() - end)
            for k, v in host_metrics.items():
                loss_meters.setdefault(k, AverageMeter()).update(v)
            samples_per_s = global_batch_size / max(batch_time_m.val, 1e-9)
            lr = float(lr_schedule(step_idx)) if lr_schedule is not None else float("nan")
            logger.info(
                "Train Epoch: %d [step %d] total_loss: %.5g "
                "data_time: %.3f batch_time: %.3f samples/s: %.1f "
                "samples/s/device: %.1f lr: %.3g logit_scale: %.3f",
                epoch, step_idx, host_metrics.get("total_loss", float("nan")),
                data_time_m.val, batch_time_m.val, samples_per_s,
                samples_per_s / max(num_devices, 1), lr,
                host_metrics.get("logit_scale", float("nan")),
            )
            if writer is not None:
                host_metrics.update({
                    "samples_per_second": samples_per_s,
                    "samples_per_second_per_device": samples_per_s / max(num_devices, 1),
                    "data_time": data_time_m.val,
                    "batch_time": batch_time_m.val,
                    "lr": lr,
                    "epoch": epoch,
                })
                writer.write(host_metrics, step_idx)
        end = time.perf_counter()

    if metrics:
        jax.block_until_ready(metrics.get("total_loss"))
    return state, steps_run

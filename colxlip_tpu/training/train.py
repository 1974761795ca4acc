"""Host-side epoch loop: feed batches to the jitted train step, log throughput.

Counterpart of reference ``train_one_epoch`` (src/colxlip/train.py:93-270):
per-step LR comes from the optax schedule compiled into the step; the loop
keeps the reference's meters (data_time, batch_time, samples/s and
samples/s/device, train.py:236-243), caption-0 selection (train.py:122), and
periodic logging. Device feeding runs in a background prefetch thread of
depth 2: host decode + host->device transfer of batch i+1/i+2 overlap the
device compute of batch i (the reference gets this from DataLoader workers +
non_blocking copies, train.py:124-125; async dispatch alone does NOT overlap
the host-side iterator work).
"""
from __future__ import annotations

import logging
import queue
import threading
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


class _PrefetchIterator:
    """Two-stage background prefetch: a HOST thread drains the input pipeline
    (decode/augment/tokenize) and a SHIP thread moves batches host->device,
    each keeping up to ``depth`` batches in flight.

    The stages are separate threads on purpose: host iteration and the H2D
    transfer would otherwise serialize inside one producer (measured: a
    ~240 ms/batch host pipeline + ~1 s/batch relay put = ~1.25 s/step even
    though the device step is 318 ms). With two stages the steady state is
    max(host, transfer, compute), not their sum. The GIL doesn't bite: the
    host stage is mostly C (JPEG decode, numpy) and the ship stage blocks in
    the PJRT client.

    Exceptions from either stage re-raise in the consumer. ``close()`` stops
    both threads promptly when the consumer exits early.
    """

    _DONE = object()

    def __init__(self, dataloader: Iterable, feeder=None, depth: int = 2,
                 trunc_meter: Optional[AverageMeter] = None):
        self._host_q: queue.Queue = queue.Queue(maxsize=depth)
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._feeder = feeder
        self._trunc_meter = trunc_meter
        self._it = iter(dataloader)
        self._host_thread = threading.Thread(
            target=self._produce_host, daemon=True)
        self._ship_thread = threading.Thread(
            target=self._produce_ship, daemon=True)
        self._host_thread.start()
        self._ship_thread.start()

    def _prep(self, images, texts):
        texts = select_caption0(np.asarray(texts))
        if self._trunc_meter is not None and texts.ndim == 2 and texts.size:
            # EOT forced into the LAST slot <=> the caption hit the context
            # cap (tokenizer truncation contract) — makes a mis-sized
            # --text-ctx visible in the train log instead of silent
            from ..data.tokenizer import EOT_TOKEN

            self._trunc_meter.update(
                float((texts[:, -1] == EOT_TOKEN).mean()))
        # keep uint8 batches as-is (device-side normalization / YUV420 wire
        # formats: 2-8x fewer host->device bytes); anything else feeds the
        # step as float32
        images = np.asarray(images)
        if images.dtype != np.uint8:
            images = np.asarray(images, np.float32)
        return images, texts

    def _ship(self, images, texts):
        if self._feeder is not None:
            return self._feeder(images, texts)
        return jnp.asarray(images), jnp.asarray(texts)

    def _put(self, q: queue.Queue, item) -> bool:
        while not self._stop.is_set():
            try:
                q.put(item, timeout=0.5)
                return True
            except queue.Full:
                continue
        return False

    def _produce_host(self):
        try:
            for batch in self._it:
                if not self._put(self._host_q, self._prep(*batch)):
                    return
            item = self._DONE
        except BaseException as e:  # noqa: BLE001 — re-raised in the consumer
            # BaseException: a SystemExit/KeyboardInterrupt raised inside
            # library code must still post a sentinel, or the ship stage's
            # queue.get would hang forever
            item = e if isinstance(e, Exception) else RuntimeError(
                f"prefetch host stage died: {type(e).__name__}: {e}")
        self._put(self._host_q, item)

    def _produce_ship(self):
        while not self._stop.is_set():
            try:
                got = self._host_q.get(timeout=0.5)
            except queue.Empty:
                if not self._host_thread.is_alive():
                    # TOCTOU guard: the host thread may have posted its final
                    # sentinel and exited between our timeout and the
                    # is_alive() check — drain once more before concluding
                    # the sentinel is missing
                    try:
                        got = self._host_q.get_nowait()
                    except queue.Empty:
                        self._put(self._q, RuntimeError(
                            "prefetch host thread died without a sentinel"))
                        return
                else:
                    continue
            if got is self._DONE or isinstance(got, Exception):
                self._put(self._q, got)
                return
            try:
                item = self._ship(*got)
            except BaseException as e:  # noqa: BLE001
                item = e if isinstance(e, Exception) else RuntimeError(
                    f"prefetch ship stage died: {type(e).__name__}: {e}")
                self._put(self._q, item)
                return
            if not self._put(self._q, item):
                return

    def __iter__(self):
        return self

    def __next__(self):
        while True:
            try:
                item = self._q.get(timeout=5.0)
                break
            except queue.Empty:
                if not self._ship_thread.is_alive():
                    raise RuntimeError(
                        "prefetch ship thread died without a sentinel")
        if item is self._DONE:
            raise StopIteration
        if isinstance(item, Exception):
            raise item
        return item

    def close(self):
        self._stop.set()
        # drain so blocked puts wake up
        for q in (self._q, self._host_q):
            try:
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass
        self._host_thread.join(timeout=5.0)
        self._ship_thread.join(timeout=5.0)


def _stop_consensus(local_stop: bool) -> bool:
    """All hosts agree on whether any host was asked to stop.

    Multi-process training MUST stop at the same step boundary on every host
    (a lone host leaving mid-epoch strands the others in the next step's
    collective), and the preemption signal can land at different step indices
    per host — so the decision is a tiny cross-process any() at fixed step
    boundaries. Single-process: just the local flag (free)."""
    if jax.process_count() == 1:
        return local_stop
    from jax.experimental import multihost_utils

    flags = multihost_utils.process_allgather(
        np.asarray([local_stop], np.int32))
    return bool(np.asarray(flags).any())


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
    prefetch_depth: int = 2,
    skip_steps: int = 0,
    stop_flag=None,
    stop_check_every: int = 20,
):
    """Run one epoch; returns (state, steps_run, stopped_early).

    skip_steps: consume (and discard) this many leading batches before
    training — the mid-epoch resume fast-forward. Deterministic pipelines
    (synthetic, seeded grain) replay the exact remaining stream; the threaded
    wds pipeline resumes at the right position in the epoch's shard schedule
    but thread scheduling may reorder within it (same caveat as torch
    DataLoader skipping). The skipped batches are never shipped to device.

    stop_flag: a ``threading.Event``-like object; when set, training stops at
    the next ``stop_check_every`` step boundary (cross-host consensus, see
    ``_stop_consensus``) and returns ``stopped_early=True`` so the caller can
    checkpoint. The reference has no preemption story at all (SURVEY §5:
    "resubmit the SLURM job with --resume latest", whole epochs lost).
    """
    batch_time_m = AverageMeter()
    data_time_m = AverageMeter()
    trunc_m = AverageMeter()
    loss_meters: Dict[str, AverageMeter] = {}

    raw_it = iter(dataloader)
    for _ in range(skip_steps):
        try:
            next(raw_it)
        except StopIteration:
            break
    if steps_per_epoch is not None:
        steps_per_epoch = max(steps_per_epoch - skip_steps, 0)

    prefetch = _PrefetchIterator(raw_it, feeder=feeder, depth=prefetch_depth,
                                 trunc_meter=trunc_m)
    # read the optimizer step count ONCE; track it host-side afterwards —
    # a per-iteration device_get(state.step) would sync every step and
    # defeat async dispatch (measured 2-4x step-time inflation through the
    # remote relay when the host core is busy decoding)
    start_step = int(jax.device_get(state.step))
    end = time.perf_counter()
    window_start = end
    last_log_i = 0
    steps_run = 0
    stopped = False
    metrics = {}
    trace_active = False
    trunc_warned = False
    try:
        for i, (images, texts) in enumerate(prefetch):
            if steps_per_epoch is not None and i >= steps_per_epoch:
                break
            # with prefetch, data_time measures true starvation (queue wait)
            data_time_m.update(time.perf_counter() - end)

            if profiler_dir and i == 2:
                jax.profiler.start_trace(profiler_dir)
                trace_active = True
            # packed feed (data_feed.pack_batch): one fused buffer, texts
            # is None and the step unpacks in-jit
            if texts is None:
                state, metrics = step_fn(state, images)
            else:
                state, metrics = step_fn(state, images, texts)
            if profiler_dir and i == 4:
                jax.block_until_ready(metrics["total_loss"])
                jax.profiler.stop_trace()
                trace_active = False

            steps_run += 1
            step_idx = start_step + steps_run

            if (i % log_every_n_steps) == 0 or (
                steps_per_epoch is not None and i == steps_per_epoch - 1
            ):
                # sync point: materialize metrics. Device work for the whole
                # window since the previous sync completes here (async
                # dispatch), so throughput is metered over the window.
                host_metrics = {k: float(jax.device_get(v)) for k, v in metrics.items()}
                now = time.perf_counter()
                window_steps = i - last_log_i if i > last_log_i else 1
                batch_time_m.update((now - window_start) / window_steps)
                last_log_i, window_start = i, now
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
                if (not trunc_warned and trunc_m.count
                        and trunc_m.avg > 0.05):
                    trunc_warned = True
                    logger.warning(
                        "text_trunc_rate %.1f%%: captions are hitting the "
                        "text context cap — if this feed trains with "
                        "--text-ctx, the cap may be under-sized "
                        "(scripts/caption_length_stats.py sizes it)",
                        100 * trunc_m.avg)
                if writer is not None:
                    host_metrics.update({
                        "samples_per_second": samples_per_s,
                        "samples_per_second_per_device": samples_per_s / max(num_devices, 1),
                        "text_trunc_rate": trunc_m.avg,
                        "data_time": data_time_m.val,
                        "batch_time": batch_time_m.val,
                        "lr": lr,
                        "epoch": epoch,
                    })
                    writer.write(host_metrics, step_idx)
            if stop_flag is not None and (i % stop_check_every) == 0:
                # the consensus collective must run at the SAME boundaries on
                # every host regardless of the local flag value
                if _stop_consensus(stop_flag.is_set()):
                    stopped = True
                    logger.info(
                        "stop requested: leaving epoch %d after %d step(s)",
                        epoch, skip_steps + steps_run)
                    break
            end = time.perf_counter()
    finally:
        prefetch.close()
        if trace_active:
            # epoch shorter than the stop step: finalize the trace so the
            # capture is written and a later start_trace doesn't raise
            try:
                jax.profiler.stop_trace()
            except Exception:  # noqa: BLE001 — best-effort finalization
                logger.warning("profiler trace finalization failed")

    if metrics:
        # device_get, not block_until_ready: the relay's async dispatch can
        # return early from block_until_ready (CLAUDE.md timing trap), and
        # main() logs the epoch wall-time right after this sync
        jax.device_get(metrics.get("total_loss"))
    return state, steps_run, stopped

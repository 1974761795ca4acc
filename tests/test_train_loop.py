"""Host epoch loop: prefetch dtype passthrough, metering, early exit.

The end-to-end loop is covered by tests/test_main_driver.py; these pin the
unit-level contracts of training/train.py (reference train_one_epoch,
src/colxlip/train.py:93-270)."""
import numpy as np
import pytest

from colxlip_tpu.training.train import _PrefetchIterator, train_one_epoch


def _batches(n, dtype):
    for i in range(n):
        imgs = np.full((4, 8, 8, 3), i, dtype)
        texts = np.zeros((4, 2, 16), np.int32)
        texts[:, 0, 0] = i
        yield imgs, texts


def test_prefetch_uint8_passthrough():
    it = _PrefetchIterator(_batches(3, np.uint8))
    imgs, texts = next(it)
    assert np.asarray(imgs).dtype == np.uint8
    assert texts.shape == (4, 16)  # caption 0 selected
    it.close()


def test_prefetch_float_cast():
    it = _PrefetchIterator(_batches(3, np.float64))
    imgs, _ = next(it)
    assert np.asarray(imgs).dtype == np.float32
    it.close()


def test_prefetch_truncation_meter():
    """EOT in the LAST slot <=> the caption hit the context cap; the meter
    makes a mis-sized --text-ctx visible (text_trunc_rate in the log)."""
    from colxlip_tpu.data.tokenizer import EOT_TOKEN
    from colxlip_tpu.training.logging_utils import AverageMeter

    def batches():
        texts = np.zeros((4, 16), np.int32)
        texts[:, 0] = 49406
        texts[:2, -1] = EOT_TOKEN     # 2 of 4 truncated
        texts[2:, 5] = EOT_TOKEN      # EOT inside the window: not truncated
        yield np.zeros((4, 8, 8, 3), np.uint8), texts

    meter = AverageMeter()
    it = _PrefetchIterator(batches(), trunc_meter=meter)
    next(it)
    it.close()
    assert meter.count == 1
    assert meter.avg == pytest.approx(0.5)


def test_prefetch_propagates_exception():
    def bad():
        yield next(_batches(1, np.float32))
        raise RuntimeError("decode failed")

    it = _PrefetchIterator(bad())
    next(it)
    with pytest.raises(RuntimeError, match="decode failed"):
        next(it)
        next(it)
    it.close()


class _FakeState:
    def __init__(self, step=0):
        self.step = np.asarray(step)


def test_train_one_epoch_counts_and_cuts():
    calls = []

    def step_fn(state, images, texts):
        calls.append(int(np.asarray(images)[0, 0, 0, 0]))
        return _FakeState(int(state.step) + 1), {"total_loss": np.float32(1.0)}

    state, steps, stopped = train_one_epoch(
        step_fn, _FakeState(5), _batches(10, np.float32),
        epoch=0, global_batch_size=4, steps_per_epoch=4,
        log_every_n_steps=2,
    )
    assert steps == 4
    assert not stopped
    assert int(state.step) == 9
    assert calls == [0, 1, 2, 3]


def test_train_one_epoch_exhausts_iterator():
    def step_fn(state, images, texts):
        return _FakeState(int(state.step) + 1), {"total_loss": np.float32(2.0)}

    state, steps, stopped = train_one_epoch(
        step_fn, _FakeState(0), _batches(3, np.uint8),
        epoch=1, global_batch_size=4, log_every_n_steps=100,
    )
    assert steps == 3
    assert not stopped
    assert int(state.step) == 3


def test_train_one_epoch_skip_steps():
    """Mid-epoch resume fast-forward: the first k batches are consumed but
    never trained on, and the steps_per_epoch cut counts the WHOLE epoch."""
    calls = []

    def step_fn(state, images, texts):
        calls.append(int(np.asarray(images)[0, 0, 0, 0]))
        return _FakeState(int(state.step) + 1), {"total_loss": np.float32(1.0)}

    state, steps, stopped = train_one_epoch(
        step_fn, _FakeState(3), _batches(10, np.float32),
        epoch=0, global_batch_size=4, steps_per_epoch=8,
        log_every_n_steps=100, skip_steps=3,
    )
    assert calls == [3, 4, 5, 6, 7]  # batches 0-2 skipped, cut at epoch step 8
    assert steps == 5
    assert not stopped
    assert int(state.step) == 8


def test_train_one_epoch_stop_flag():
    """A set stop flag halts at the next check boundary and reports it."""
    import threading

    flag = threading.Event()

    def step_fn(state, images, texts):
        if int(state.step) == 2:  # "signal" lands during step 3
            flag.set()
        return _FakeState(int(state.step) + 1), {"total_loss": np.float32(1.0)}

    state, steps, stopped = train_one_epoch(
        step_fn, _FakeState(0), _batches(50, np.float32),
        epoch=0, global_batch_size=4, log_every_n_steps=100,
        stop_flag=flag, stop_check_every=2,
    )
    assert stopped
    # flag set during step i=2; checks run after steps i=0,2,4 -> stops at i=2
    assert steps == 3
    assert int(state.step) == 3

"""Per-step learning-rate schedules.

Native counterparts of the imported ``open_clip_train.scheduler`` lambdas
(SURVEY.md §2.2; reference call site main.py:338-348):
  - cosine_lr          : linear warmup -> cosine decay to 0
  - const_lr           : linear warmup -> constant
  - const_lr_cooldown  : warmup -> constant -> polynomial cooldown tail
Returned callables map step -> lr and plug into optax inject_hyperparams.
"""
from __future__ import annotations

from typing import Callable

import jax.numpy as jnp


def _warmup(step, base_lr, warmup_length):
    return base_lr * (step + 1) / jnp.maximum(warmup_length, 1)


def cosine_lr(base_lr: float, warmup_length: int, steps: int) -> Callable:
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = _warmup(step, base_lr, warmup_length)
        e = step - warmup_length
        es = jnp.maximum(steps - warmup_length, 1)
        cos = 0.5 * (1 + jnp.cos(jnp.pi * e / es)) * base_lr
        return jnp.where(step < warmup_length, warm, cos)
    return schedule


def const_lr(base_lr: float, warmup_length: int) -> Callable:
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        return jnp.where(step < warmup_length, _warmup(step, base_lr, warmup_length), base_lr)
    return schedule


def const_lr_cooldown(
    base_lr: float,
    warmup_length: int,
    steps: int,
    cooldown_steps: int,
    cooldown_power: float = 1.0,
    cooldown_end_lr: float = 0.0,
) -> Callable:
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        start_cooldown = steps - cooldown_steps
        # decay clamped at 0 so a run past total_steps holds end_lr instead
        # of going NEGATIVE (the reference scheduler's latent landmine when
        # steps_per_epoch underestimates the pipeline length)
        e = jnp.maximum(step - start_cooldown, 0.0)
        decay = jnp.maximum(1 - e / cooldown_steps, 0.0) ** cooldown_power
        cooled = decay * (base_lr - cooldown_end_lr) + cooldown_end_lr
        out = jnp.where(step >= start_cooldown, cooled, base_lr)
        # warmup FIRST, like the reference (open_clip const_lr_cooldown
        # checks `step < warmup_length` before the cooldown window) — a
        # config with steps - cooldown_steps < warmup_length must warm up,
        # not start cooling from step 0
        return jnp.where(step < warmup_length,
                         _warmup(step, base_lr, warmup_length), out)
    return schedule

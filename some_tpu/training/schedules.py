"""Learning-rate schedules as optax-compatible callables.

WarmupLR reproduces the Noam-style warmup with min-lr floor that all shipped
SOME configs use (reference: lr_scheduler/scheduler.py:10-62):

    lr = base_lr * warmup_steps**0.5 * min(step**-0.5, step * warmup_steps**-1.5)
    floored at min_lr only after warmup; step is 1-based.

The step passed by optax is 0-based (number of completed updates), matching
the torch scheduler's ``last_epoch + 1`` convention.
"""
from __future__ import annotations

import jax.numpy as jnp


class WarmupLR:
    def __init__(self, lr: float, warmup_steps: int = 5000, min_lr: float = 2e-5):
        self.base_lr = float(lr)
        self.warmup_steps = warmup_steps
        self.min_lr = float(min_lr)

    def __call__(self, step):
        step_num = jnp.asarray(step, dtype=jnp.float32) + 1.0
        if self.warmup_steps == 0:
            lr = self.base_lr * step_num ** -0.5
            return jnp.maximum(lr, self.min_lr)
        ws = float(self.warmup_steps)
        lr = self.base_lr * ws ** 0.5 * jnp.minimum(step_num ** -0.5,
                                                    step_num * ws ** -1.5)
        return jnp.where((lr < self.min_lr) & (step_num > ws), self.min_lr, lr)


class WarmupCosineSchedule:
    """Linear warmup then cosine decay (reference: utils/training_utils.py:20-40)."""

    def __init__(self, lr: float, warmup_steps: int, t_total: int,
                 eta_min: float = 0.0, cycles: float = 0.5):
        self.base_lr = float(lr)
        self.warmup_steps = warmup_steps
        self.t_total = t_total
        self.eta_min = eta_min
        self.cycles = cycles

    def __call__(self, step):
        step = jnp.asarray(step, dtype=jnp.float32)
        warm = step / jnp.maximum(1.0, self.warmup_steps)
        progress = (step - self.warmup_steps) / max(1, self.t_total - self.warmup_steps)
        cos = jnp.maximum(
            self.eta_min,
            0.5 * (1.0 + jnp.cos(jnp.pi * self.cycles * 2.0 * progress)))
        return self.base_lr * jnp.where(step < self.warmup_steps, warm, cos)


def build_schedule(scheduler_args: dict, base_lr: float):
    """Config dict -> schedule callable (scheduler_cls resolved via registry)."""
    from some_tpu.registry import filter_kwargs, resolve_class

    cls = resolve_class(scheduler_args["scheduler_cls"])
    kwargs = {k: v for k, v in scheduler_args.items() if k != "scheduler_cls"}
    kwargs["lr"] = base_lr
    return cls(**filter_kwargs(kwargs, cls))

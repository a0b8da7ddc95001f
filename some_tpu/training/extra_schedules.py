"""Cosine-restart scheduler family (reference: lr_scheduler/scheduler.py).

The reference ships several SGDR-style variants, mostly dead code (all
shipped configs use WarmupLR), kept here so configs naming them still load.
Each is a pure step->lr callable usable as an optax schedule.
"""
from __future__ import annotations

import jax.numpy as jnp


class SGDRLR:
    """Cosine annealing with warm restarts (SGDR, Loshchilov & Hutter)."""

    def __init__(self, lr: float, warmup_steps: int = 25000, min_lr: float = 1e-5,
                 T_0: int = 1500, eta_max: float = 0.1, eta_min: float = 0.0,
                 T_mul: int = 2):
        self.base_lr = float(lr)
        self.warmup_steps = warmup_steps
        self.min_lr = float(min_lr)
        self.T_0 = T_0
        self.eta_max = eta_max
        self.eta_min = eta_min
        self.T_mul = T_mul

    def _restart_lr(self, step_num):
        if self.T_mul == 2:
            i = jnp.floor(jnp.log2(step_num / self.T_0 + 1.0))
            t_cur = step_num - self.T_0 * (2.0 ** i - 1.0)
            t_i = self.T_0 * 2.0 ** i
        else:
            t_cur = jnp.mod(step_num, self.T_0)
            t_i = float(self.T_0)
        return self.eta_min + 0.5 * (self.eta_max - self.eta_min) * (
            1.0 + jnp.cos(jnp.pi * t_cur / t_i))

    def __call__(self, step):
        step_num = jnp.asarray(step, jnp.float32) + 1.0
        lr = self._restart_lr(step_num)
        return jnp.maximum(lr, self.min_lr)


class NoamHoldAnnealing:
    """Squeezeformer-style warmup/hold/decay schedule."""

    def __init__(self, lr: float, warmup_steps: int, hold_steps: int = 0,
                 decay_rate: float = 0.5, min_lr: float = 0.0):
        self.base_lr = float(lr)
        self.warmup_steps = warmup_steps
        self.hold_steps = hold_steps
        self.decay_rate = decay_rate
        self.min_lr = float(min_lr)

    def __call__(self, step):
        step_num = jnp.asarray(step, jnp.float32) + 1.0
        warm = self.warmup_steps
        hold = warm + self.hold_steps
        warmup_lr = self.base_lr * step_num / max(warm, 1)
        decay_lr = self.base_lr * (step_num - hold + 1.0).clip(1.0) ** (
            -self.decay_rate)
        lr = jnp.where(step_num <= warm, warmup_lr,
                       jnp.where(step_num <= hold, self.base_lr, decay_lr))
        return jnp.maximum(lr, self.min_lr)

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


class LSGDRLR:
    """'L' SGDR variant (reference: lr_scheduler/scheduler.py:132-193).

    The reference formula is ``eta_min * T_mult**step + cos(pi*step/T_0)`` —
    an unscaled cosine that goes negative; dead code upstream (no shipped
    config uses it), reproduced verbatim so configs naming it behave
    identically. warmup_steps/min_lr are accepted but unused, exactly as in
    the reference's get_lr (scheduler.py:174-188 calls adjust_lr on both
    branches).
    """

    def __init__(self, lr: float, warmup_steps: int = 25000, min_lr: float = 1e-5,
                 T_0: int = 1500, eta_max: float = 0.1, eta_min: float = 0.0,
                 T_mul: int = 2, T_mult: float = 0.9999):
        self.base_lr = float(lr)
        self.warmup_steps = warmup_steps
        self.min_lr = float(min_lr)
        self.T_0 = T_0
        self.eta_max = eta_max
        self.eta_min = eta_min
        self.T_mul = T_mul
        self.T_mult = T_mult

    def __call__(self, step):
        step_num = jnp.asarray(step, jnp.float32) + 1.0
        return (self.eta_min * jnp.asarray(self.T_mult, jnp.float32) ** step_num
                + jnp.cos(jnp.pi * step_num / self.T_0))


class V2LSGDRLR:
    """Decaying-restart SGDR v2 (reference: lr_scheduler/scheduler.py:195-248).

    Linear warmup to eta_max over ws steps, then cosine restarts of period
    T_0 whose amplitude decays by tmctx per completed cycle. The reference
    hardcodes the curve constants as ctxadjust_lr defaults (scheduler.py:228:
    T_0=15000, eta_min=1e-7, eta_max=6e-5, tmctx=0.99, ws=8000), ignoring the
    constructor args; upstream also never overrides get_lr, so stepping the
    torch class raises — the curve here is what ctxadjust_lr computes.
    """

    CTX = dict(T_0=15000.0, eta_min=0.0000001, eta_max=0.00006, tmctx=0.99,
               ws=8000.0)

    def __init__(self, lr: float, **_ignored):
        self.base_lr = float(lr)

    def _cycle_lr(self, step_num, eta_min_scaled: bool):
        c = self.CTX
        t_cur = jnp.mod(step_num + c["ws"], c["T_0"])
        t_curx = jnp.floor((step_num + c["ws"]) / c["T_0"])
        decay = c["tmctx"] ** t_curx
        eta_min = c["eta_min"] * decay if eta_min_scaled else c["eta_min"]
        lr = eta_min + 0.5 * (c["eta_max"] * decay - c["eta_min"] * decay) * (
            1.0 + jnp.cos(jnp.pi * t_cur / c["T_0"]))
        warm = step_num * (c["eta_max"] / c["ws"])
        return jnp.where(c["ws"] > step_num, warm, lr)

    def __call__(self, step):
        step_num = jnp.asarray(step, jnp.float32) + 1.0
        return self._cycle_lr(step_num, eta_min_scaled=False)


class V3LSGDRLR(V2LSGDRLR):
    """v3: like v2 but the cosine floor also decays and with different
    constants (reference: lr_scheduler/scheduler.py:250-305: T_0=15000,
    eta_min=6e-5, eta_max=9e-5, tmctx=0.98, ws=5000)."""

    CTX = dict(T_0=15000.0, eta_min=0.00006, eta_max=0.00009, tmctx=0.98,
               ws=5000.0)

    def __call__(self, step):
        step_num = jnp.asarray(step, jnp.float32) + 1.0
        return self._cycle_lr(step_num, eta_min_scaled=True)


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

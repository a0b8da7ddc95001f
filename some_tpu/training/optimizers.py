"""Optimizer factories (optax) resolved from SOME config dicts.

The reference builds ``torch.optim.AdamW`` by class path with beta1/beta2
keys folded into ``betas`` (reference: training/base_task.py:331-344); the
aliases in some_tpu.registry route those class paths here. AdamW semantics:
optax.adamw with torch eps (1e-8) and decoupled weight decay matches
torch.optim.AdamW update math.
"""
from __future__ import annotations

import optax


def AdamW(learning_rate, beta1: float = 0.9, beta2: float = 0.999,
          eps: float = 1e-8, weight_decay: float = 1e-2):
    return optax.adamw(learning_rate, b1=beta1, b2=beta2, eps=eps,
                       weight_decay=weight_decay)


def Adam(learning_rate, beta1: float = 0.9, beta2: float = 0.999, eps: float = 1e-8):
    return optax.adam(learning_rate, b1=beta1, b2=beta2, eps=eps)


def build_optimizer(optimizer_args: dict, schedule, clip_grad_norm: float | None = None):
    """Config dict + lr schedule -> optax.GradientTransformation.

    Gradient clipping by global norm (reference: configs/base.yaml clip_grad_norm,
    applied by the Lightning trainer at train.py:88) is folded in here.
    """
    from some_tpu.registry import filter_kwargs, resolve_class

    factory = resolve_class(optimizer_args["optimizer_cls"])
    kwargs = {k: v for k, v in optimizer_args.items()
              if k not in ("optimizer_cls", "lr")}
    tx = factory(learning_rate=schedule, **filter_kwargs(kwargs, factory))
    if clip_grad_norm is not None and clip_grad_norm > 0:
        tx = optax.chain(optax.clip_by_global_norm(clip_grad_norm), tx)
    return tx

"""Torch-style parameter (re)initialization.

From-scratch training in the reference starts from torch defaults:
``nn.Linear``/``nn.Conv1d`` use kaiming_uniform(a=sqrt(5)) for weights —
which reduces to U(+-1/sqrt(fan_in)) — and U(+-1/sqrt(fan_in)) for biases;
norms start at scale 1 / bias 0. flax defaults (lecun_normal, zero bias)
give a different starting distribution, so ``torch_style_init`` rewrites an
initialized variable tree to the torch distributions for comparable training
dynamics. Enabled via ``torch_style_init: true`` (default) in training.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def _fan_in(kernel_shape) -> int:
    """fan_in for our kernel layouts: Dense [in, out] -> in;
    depthwise [k, C] -> k (torch Conv1d groups=C: in/groups * k = k)."""
    return int(np.prod(kernel_shape[:-1]))


def torch_style_init(params: Any, seed: int = 0) -> Any:
    """Resample kernels/biases of a flax params tree with torch defaults."""
    rng = np.random.default_rng(seed)

    def visit(tree):
        if not isinstance(tree, dict):
            return tree
        out = {}
        kernel = tree.get("kernel")
        for key, value in tree.items():
            if isinstance(value, dict):
                out[key] = visit(value)
                continue
            arr = np.asarray(value)
            if key == "kernel":
                bound = 1.0 / np.sqrt(max(_fan_in(arr.shape), 1))
                out[key] = rng.uniform(-bound, bound, arr.shape).astype(arr.dtype)
            elif key == "bias" and kernel is not None:
                bound = 1.0 / np.sqrt(max(_fan_in(np.asarray(kernel).shape), 1))
                out[key] = rng.uniform(-bound, bound, arr.shape).astype(arr.dtype)
            else:  # norm scales/biases and anything else keep flax defaults
                out[key] = arr
        return out

    return visit(params)

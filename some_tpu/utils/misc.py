"""Small API-parity helpers (reference: utils/__init__.py assorted)."""
from __future__ import annotations

from typing import Any, Dict

import numpy as np


def tensors_to_scalars(metrics: Dict[str, Any]) -> Dict[str, Any]:
    """Recursively convert 0-d arrays to python scalars
    (reference: utils/__init__.py:14-22)."""
    out = {}
    for key, value in metrics.items():
        if isinstance(value, dict):
            out[key] = tensors_to_scalars(value)
        elif hasattr(value, "item") and getattr(value, "ndim", 1) == 0:
            out[key] = value.item()
        else:
            out[key] = value
    return out


def remove_padding(x: np.ndarray, padding_idx: int = 0) -> np.ndarray:
    """Strip zero rows/values (reference: utils/__init__.py:198-205)."""
    if x is None:
        return None
    assert x.ndim in (1, 2)
    if x.ndim == 2:
        return x[np.abs(x).sum(-1) != padding_idx]
    return x[x != padding_idx]


def num_params(params, print_out: bool = True, model_name: str = "model") -> float:
    """Trainable parameter count in millions
    (reference: utils/__init__.py:213-218)."""
    import jax

    count = sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(params))
    millions = count / 1_000_000
    if print_out:
        print(f"| {model_name} Trainable Parameters: {millions:.3f}M")
    return millions


def print_arch(model, params=None, model_name: str = "model") -> None:
    """Model summary (reference: utils/__init__.py:208-210)."""
    print(f"| {model_name} Arch: ", model)
    if params is not None:
        num_params(params, model_name=model_name)


def random_continuous_masks(*shape: int, dim: int, rng=None) -> np.ndarray:
    """Random contiguous True spans along ``dim``
    (reference: utils/__init__.py:37-47; unused upstream, kept for parity)."""
    rng = np.random.default_rng() if rng is None else rng
    lohi = np.sort(rng.integers(0, shape[dim] + 1,
                                size=(*shape[:dim], 2,
                                      *((1,) * (len(shape) - dim - 1)))), axis=dim)
    start = np.expand_dims(np.take(lohi, 0, axis=dim), dim)
    end = np.expand_dims(np.take(lohi, 1, axis=dim), dim)
    idx = np.arange(shape[dim]).reshape(
        *((1,) * dim), shape[dim], *((1,) * (len(shape) - dim - 1)))
    return (idx >= start) & (idx < end)

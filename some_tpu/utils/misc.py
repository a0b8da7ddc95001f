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

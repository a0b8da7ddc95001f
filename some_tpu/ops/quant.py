"""Int8 quantized matmul primitives for the serving path.

v5e's MXU runs int8 x int8 -> int32 at 2x the bf16 rate (394 vs 197 TOP/s),
so the inference engine can trade ~0.4% per-matmul quantization noise for
up to 2x on the matmul-bound conformer forward. Scheme:

* weights: per-output-channel symmetric int8, quantized ONCE at engine load
  (host side, exact f32 math) — scales ride in a ``qscales`` variable
  collection parallel to ``params``;
* activations: dynamic per-tensor symmetric int8, computed inside the jitted
  graph (one amax reduction + one quantize pass per matmul);
* accumulation: exact int32 on the MXU, then a single f32 rescale
  (sx * sw[channel]).

The reference has no quantized path (torch fp16 autocast only,
reference: train.py:76); this is a TPU-first superset gated behind
``quantize: int8`` — off by default, bit-identical behavior when off.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def quantize_weight(w: np.ndarray):
    """f32 [K, N] -> (int8 [K, N], f32 scale [N]) per-output-channel."""
    w = np.asarray(w, np.float32)
    amax = np.max(np.abs(w), axis=0)
    scale = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
    q = np.clip(np.round(w / scale[None, :]), -127, 127).astype(np.int8)
    return q, scale


def quantize_activation(x: jnp.ndarray):
    """Dynamic per-tensor symmetric int8: (int8 x, f32 scalar scale)."""
    xf = x.astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(xf)) / 127.0, 1e-8)
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    return xq, sx


def int8_matmul(xq: jnp.ndarray, sx: jnp.ndarray, wq: jnp.ndarray,
                sw: jnp.ndarray, out_dtype) -> jnp.ndarray:
    """(int8 [..., K], scalar) @ (int8 [K, N], [N]) -> [..., N] out_dtype."""
    acc = jax.lax.dot_general(
        xq, wq, (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * (sx * sw)).astype(out_dtype)


def dynamic_int8_dense(x: jnp.ndarray, wq: jnp.ndarray, sw: jnp.ndarray,
                       out_dtype) -> jnp.ndarray:
    """Quantize x on the fly and run the int8 MXU matmul."""
    xq, sx = quantize_activation(x)
    return int8_matmul(xq, sx, wq, sw, out_dtype)


# module-relative kernel paths eligible for int8 serving: the matmul-bound
# bulk of the conformer. Heads (out_proj top-level, bound_head), input
# projections, depthwise taps, and all norms stay f32 — they are a rounding
# error of the FLOPs and the decode thresholds ride on their precision.
_QUANT_LEAF_MODULES = frozenset({
    "fc1", "fc2",            # FeedForward
    "pw1", "pw2",            # ConvModule pointwise
    "q_proj", "kv_proj", "out_proj",  # SelfAttention (block-level out_proj)
    "midi_gate", "bound_gate",        # DualStreamBlock GLU gates
})


def _is_attention_or_block_scope(path) -> bool:
    """True for kernels inside conformer blocks (not the top-level heads)."""
    # top-level modules live directly under backbone: in_proj_*, out_proj,
    # bound_head. Block-level kernels have at least one layer/block scope
    # above the leaf module.
    return len(path) >= 3


def quantize_params(params: Dict) -> tuple[Dict, Dict]:
    """Walk a flax param tree; replace eligible kernels with int8 and return
    (new_params, qscales) where qscales mirrors the tree with
    ``kernel_scale`` leaves next to each quantized kernel."""
    qscales: Dict = {}

    def walk(tree, path):
        out = {}
        for key, value in tree.items():
            if isinstance(value, dict):
                out[key] = walk(value, path + (key,))
            else:
                out[key] = value
        mod = path[-1] if path else ""
        if (mod in _QUANT_LEAF_MODULES and "kernel" in out
                and not isinstance(out["kernel"], dict)
                and np.asarray(out["kernel"]).ndim == 2
                and _is_attention_or_block_scope(path)):
            q, scale = quantize_weight(np.asarray(out["kernel"]))
            out["kernel"] = q
            node = qscales
            for key in path[:-1]:
                node = node.setdefault(key, {})
            node[path[-1]] = {"kernel_scale": scale}
        return out

    new_params = walk(params, ())
    return new_params, qscales

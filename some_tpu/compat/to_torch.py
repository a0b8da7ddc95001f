"""flax -> PyTorch checkpoint conversion (the reverse of torch_ckpt.py).

Lets SOME-TPU-trained models flow back into the torch reference ecosystem
(its ONNX exporter, existing serving setups): produces a Lightning-style
``.ckpt`` whose ``state_dict`` carries the reference's ``model.model.*`` key
layout (reference: inference/base_infer.py:27-33 expects the ``model.``
prefix; the inner wrapper attribute is also ``model``).
"""
from __future__ import annotations

import pathlib
import re
from typing import Dict

import numpy as np


def _walk(tree: dict, prefix=()):
    for key, value in tree.items():
        if isinstance(value, dict):
            yield from _walk(value, prefix + (key,))
        else:
            yield prefix + (key,), np.asarray(value)


def backbone_to_torch_state_dict(params: dict, batch_stats: dict | None = None
                                 ) -> Dict[str, np.ndarray]:
    """Invert some_tpu.compat.torch_ckpt.convert_backbone_state_dict."""
    out: Dict[str, np.ndarray] = {}

    simple = {"in_proj_midi": "inln", "in_proj_bound": "inln1",
              "out_proj": "outln", "bound_head": "cutheard"}
    block_map = {"midi_block": "att1", "bound_block": "att2",
                 "final_midi": "att1", "final_bound": "att2"}

    def block_key(parts, leaf, value, stat=False):
        """(ffn1, fc1, kernel) etc. -> torch block-relative key + tensor."""
        head = parts[0]
        m = re.match(r"ffn([12])$", head)
        if m:
            fc = {"fc1": "ln1", "fc2": "ln2"}[parts[1]]
            return (f"ffn{m.group(1)}.{fc}.{'weight' if leaf == 'kernel' else 'bias'}",
                    value.T if leaf == "kernel" else value)
        if head == "attn":
            proj = {"q_proj": "to_q", "kv_proj": "to_kv", "out_proj": "to_out.0"}[parts[1]]
            return (f"att.{proj}.{'weight' if leaf == 'kernel' else 'bias'}",
                    value.T if leaf == "kernel" else value)
        if head == "conv":
            sub = parts[1]
            if sub in ("pw1", "pw2"):
                name = {"pw1": "pointwise_conv1", "pw2": "pointwise_conv2"}[sub]
                if leaf == "kernel":
                    return f"conv.{name}.weight", value.T[:, :, None]
                return f"conv.{name}.bias", value
            if sub == "dw":
                if leaf == "kernel":
                    return "conv.depthwise_conv.weight", value.T[:, None, :]
                return "conv.depthwise_conv.bias", value
            if sub == "bn":
                if stat:
                    name = {"mean": "running_mean", "var": "running_var"}[leaf]
                else:
                    name = {"scale": "weight", "bias": "bias"}[leaf]
                return f"conv.norm.{name}", value
        m = re.match(r"norm([1-5])$", head)
        if m:
            return (f"norm{m.group(1)}.{'weight' if leaf == 'scale' else 'bias'}",
                    value)
        raise KeyError(f"unmapped block path: {parts} {leaf}")

    def emit(tree, stat=False):
        backbone = tree.get("backbone", tree)
        for path, value in _walk(backbone):
            head, leaf = path[0], path[-1]
            if head in simple:
                name = "weight" if leaf == "kernel" else "bias"
                out[f"model.{simple[head]}.{name}"] = (
                    value.T if leaf == "kernel" else value)
                continue
            m = re.match(r"layer_(\d+)$", head)
            if m:
                sub = path[1]
                if sub in ("midi_gate", "bound_gate"):
                    glu = "glu1" if sub == "midi_gate" else "glu2"
                    name = "weight" if leaf == "kernel" else "bias"
                    out[f"model.cf_lay.{m.group(1)}.{glu}.0.{name}"] = (
                        value.T if leaf == "kernel" else value)
                    continue
                key, tensor = block_key(path[2:-1], leaf, value, stat)
                out[f"model.cf_lay.{m.group(1)}.{block_map[sub]}.{key}"] = tensor
                continue
            if head in ("final_midi", "final_bound"):
                key, tensor = block_key(path[1:-1], leaf, value, stat)
                out[f"model.{block_map[head]}.{key}"] = tensor
                continue
            raise KeyError(f"unmapped path: {path}")

    emit(params, stat=False)
    if batch_stats:
        emit(batch_stats, stat=True)
    # torch BatchNorm tracks num_batches_tracked; emit zeros for completeness
    for key in list(out):
        m = re.match(r"(.*conv\.norm)\.running_mean$", key)
        if m:
            out[f"{m.group(1)}.num_batches_tracked"] = np.asarray(0, dtype=np.int64)
    return out


def save_torch_checkpoint(params: dict, batch_stats: dict | None,
                          path: pathlib.Path | str) -> None:
    """Write a reference-compatible Lightning-style .ckpt."""
    import torch

    state_dict = {
        f"model.{k}": torch.from_numpy(np.ascontiguousarray(v))
        for k, v in backbone_to_torch_state_dict(params, batch_stats).items()
    }
    torch.save({"state_dict": state_dict}, str(path))

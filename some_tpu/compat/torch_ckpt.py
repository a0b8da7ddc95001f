"""PyTorch -> flax checkpoint conversion.

Loads checkpoints published for the reference implementation (Lightning
``.ckpt`` with ``state_dict`` keys prefixed ``model.`` — reference:
inference/base_infer.py:27-33) and rewrites them into the SOME-TPU flax
variable tree ({'params': ..., 'batch_stats': ...}).

Torch module layout being mapped (reference: modules/conform/Gconform.py):
    model.inln / inln1            -> backbone.in_proj_midi / in_proj_bound
    model.outln / cutheard        -> backbone.out_proj / bound_head
    model.cf_lay.{i}.att1|att2    -> backbone.layer_{i}.midi_block|bound_block
    model.cf_lay.{i}.glu1.0|glu2.0-> backbone.layer_{i}.midi_gate|bound_gate
    model.att1 / att2 (top level) -> backbone.final_midi / final_bound
and inside each conformer block:
    ffn{1,2}.ln{1,2}   -> ffn{1,2}.fc{1,2}        (Linear: weight transposed)
    att.to_q|to_kv     -> attn.q_proj|kv_proj     (bias-free Linear)
    att.to_out.0       -> attn.out_proj
    conv.pointwise_conv{1,2} -> conv.pw{1,2}      ([out,in,1] -> [in,out])
    conv.depthwise_conv      -> conv.dw           ([C,1,k] -> [k,C])
    conv.norm          -> conv.bn  (+ running stats into batch_stats)
    norm{1..5}         -> norm{1..5} (LayerNorm weight -> scale)
"""
from __future__ import annotations

import pathlib
import re
from typing import Dict, Tuple

import numpy as np


def _set_path(tree: dict, path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for key in path[:-1]:
        node = node.setdefault(key, {})
    node[path[-1]] = value


def _map_block_key(rest: str) -> Tuple[Tuple[str, ...], str, str] | None:
    """Map a conformer-block-relative torch key.

    Returns (path_prefix_inside_block, leaf_name, kind) where kind is one of
    'linear_w', 'bias', 'dw_w', 'pw_w', 'ln_w', 'bn_stat_mean', 'bn_stat_var',
    'drop'.
    """
    m = re.match(r"ffn([12])\.ln([12])\.(weight|bias)$", rest)
    if m:
        ffn, fc, leaf = m.groups()
        return ((f"ffn{ffn}", f"fc{fc}"),
                "kernel" if leaf == "weight" else "bias",
                "linear_w" if leaf == "weight" else "bias")
    m = re.match(r"att\.to_(q|kv)\.weight$", rest)
    if m:
        return (("attn", f"{m.group(1)}_proj"), "kernel", "linear_w")
    m = re.match(r"att\.to_out\.0\.(weight|bias)$", rest)
    if m:
        leaf = m.group(1)
        return (("attn", "out_proj"),
                "kernel" if leaf == "weight" else "bias",
                "linear_w" if leaf == "weight" else "bias")
    m = re.match(r"conv\.pointwise_conv([12])\.(weight|bias)$", rest)
    if m:
        idx, leaf = m.groups()
        return (("conv", f"pw{idx}"),
                "kernel" if leaf == "weight" else "bias",
                "pw_w" if leaf == "weight" else "bias")
    m = re.match(r"conv\.depthwise_conv\.(weight|bias)$", rest)
    if m:
        leaf = m.group(1)
        return (("conv", "dw"),
                "kernel" if leaf == "weight" else "bias",
                "dw_w" if leaf == "weight" else "bias")
    m = re.match(r"conv\.norm\.(weight|bias|running_mean|running_var|num_batches_tracked)$", rest)
    if m:
        leaf = m.group(1)
        if leaf == "num_batches_tracked":
            return None
        if leaf == "weight":
            return (("conv", "bn"), "scale", "bias")
        if leaf == "bias":
            return (("conv", "bn"), "bias", "bias")
        if leaf == "running_mean":
            return (("conv", "bn"), "mean", "bn_stat_mean")
        return (("conv", "bn"), "var", "bn_stat_var")
    m = re.match(r"norm([1-5])\.(weight|bias)$", rest)
    if m:
        idx, leaf = m.groups()
        return ((f"norm{idx}",), "scale" if leaf == "weight" else "bias", "bias")
    raise KeyError(f"unrecognized conformer block key: {rest}")


def convert_backbone_state_dict(state_dict: Dict[str, np.ndarray]) -> dict:
    """Torch backbone state_dict (keys starting 'model.') -> flax variables."""
    params: dict = {}
    batch_stats: dict = {}

    simple = {
        "inln": ("in_proj_midi",), "inln1": ("in_proj_bound",),
        "outln": ("out_proj",), "cutheard": ("bound_head",),
    }

    for key, value in state_dict.items():
        if not key.startswith("model."):
            continue
        rest = key[len("model."):]
        value = np.asarray(value)

        head = rest.split(".", 1)[0]
        if head in simple:
            leaf = rest.rsplit(".", 1)[1]
            path = ("backbone",) + simple[head]
            if leaf == "weight":
                _set_path(params, path + ("kernel",), value.T)
            else:
                _set_path(params, path + ("bias",), value)
            continue

        m = re.match(r"cf_lay\.(\d+)\.(att1|att2|glu1|glu2)\.(.+)$", rest)
        if m:
            layer_idx, sub, tail = m.groups()
            layer = f"layer_{layer_idx}"
            if sub in ("glu1", "glu2"):
                gate = "midi_gate" if sub == "glu1" else "bound_gate"
                leaf = tail.rsplit(".", 1)[1]  # '0.weight' -> 'weight'
                path = ("backbone", layer, gate)
                if leaf == "weight":
                    _set_path(params, path + ("kernel",), value.T)
                else:
                    _set_path(params, path + ("bias",), value)
                continue
            block = "midi_block" if sub == "att1" else "bound_block"
            prefix = ("backbone", layer, block)
        else:
            m = re.match(r"(att1|att2)\.(.+)$", rest)
            if not m:
                raise KeyError(f"unrecognized checkpoint key: {key}")
            block = "final_midi" if m.group(1) == "att1" else "final_bound"
            tail = m.group(2)
            prefix = ("backbone", block)

        mapped = _map_block_key(tail)
        if mapped is None:
            continue
        inner_path, leaf, kind = mapped
        full = prefix + inner_path + (leaf,)
        if kind == "linear_w":
            _set_path(params, full, value.T)
        elif kind == "pw_w":
            _set_path(params, full, value[:, :, 0].T)  # [out,in,1] -> [in,out]
        elif kind == "dw_w":
            _set_path(params, full, value[:, 0, :].T)  # [C,1,k] -> [k,C]
        elif kind in ("bn_stat_mean", "bn_stat_var"):
            _set_path(batch_stats, full, value)
        else:
            _set_path(params, full, value)

    return {"params": params, "batch_stats": batch_stats}


def load_torch_checkpoint(path: pathlib.Path | str,
                          prefix_in_ckpt: str = "model") -> dict:
    """Load a reference .ckpt and return flax variables (float32 numpy)."""
    import torch

    ckpt = torch.load(str(path), map_location="cpu", weights_only=False)
    state_dict = ckpt.get("state_dict", ckpt)
    if prefix_in_ckpt:
        state_dict = {
            k[len(prefix_in_ckpt) + 1:]: v
            for k, v in state_dict.items() if k.startswith(f"{prefix_in_ckpt}.")
        }
    state_np = {k: v.detach().cpu().numpy().astype(np.float32)
                for k, v in state_dict.items()}
    return convert_backbone_state_dict(state_np)

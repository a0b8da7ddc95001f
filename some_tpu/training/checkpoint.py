"""Step-named checkpoint store with top-k + permanent retention.

Native format: a single msgpack file ``model_ckpt_steps_{step}.ckpt`` holding
{meta, params, batch_stats, opt_state} — loadable in one read, no torch
pickle. Retention policy mirrors the reference checkpoint manager
(reference: utils/training_utils.py:182-276): keep the newest ``keep_top_k``
by step, but never delete checkpoints on the permanent schedule
(step >= permanent_start and (step - permanent_start) % permanent_interval == 0).

``load_any_checkpoint`` also accepts reference torch ``.ckpt`` files (zip
magic) and converts them on the fly, so published SOME models drop in.
"""
from __future__ import annotations

import pathlib
import re
from typing import Any, Dict, Optional

import numpy as np
from flax import serialization

CKPT_RE = re.compile(r"model_ckpt_steps_(\d+)\.ckpt$")


def checkpoint_path(work_dir: pathlib.Path | str, step: int) -> pathlib.Path:
    return pathlib.Path(work_dir) / f"model_ckpt_steps_{step}.ckpt"


def list_checkpoints(work_dir: pathlib.Path | str):
    work_dir = pathlib.Path(work_dir)
    if not work_dir.exists():
        return []
    found = []
    for p in work_dir.glob("model_ckpt_steps_*.ckpt"):
        m = CKPT_RE.search(p.name)
        if m:
            found.append((int(m.group(1)), p))
    return sorted(found)


def latest_checkpoint(work_dir: pathlib.Path | str) -> Optional[pathlib.Path]:
    ckpts = list_checkpoints(work_dir)
    return ckpts[-1][1] if ckpts else None


def _to_numpy_tree(tree):
    import jax
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(work_dir: pathlib.Path | str, step: int, params: Any,
                    batch_stats: Any = None, opt_state: Any = None,
                    extra_meta: Dict | None = None) -> pathlib.Path:
    work_dir = pathlib.Path(work_dir)
    work_dir.mkdir(parents=True, exist_ok=True)
    payload = {
        "meta": {"format": "some-tpu-v1", "step": step, **(extra_meta or {})},
        "params": _to_numpy_tree(params),
        "batch_stats": _to_numpy_tree(batch_stats or {}),
        "opt_state": serialization.to_state_dict(_to_numpy_tree(opt_state))
        if opt_state is not None else None,
    }
    path = checkpoint_path(work_dir, step)
    tmp = path.with_suffix(".tmp")
    tmp.write_bytes(serialization.msgpack_serialize(payload))
    tmp.replace(path)
    return path


def load_native_checkpoint(path: pathlib.Path | str) -> dict:
    data = pathlib.Path(path).read_bytes()
    return serialization.msgpack_restore(data)


def is_torch_checkpoint(path: pathlib.Path | str) -> bool:
    with open(path, "rb") as f:
        magic = f.read(2)
    return magic == b"PK" or magic == b"\x80\x02"  # zip or legacy pickle


def load_any_checkpoint(path: pathlib.Path | str) -> dict:
    """Load either a native SOME-TPU ckpt or a reference torch ckpt.

    Returns {'meta': ..., 'params': ..., 'batch_stats': ..., 'opt_state': ...}
    with opt_state None for converted torch checkpoints.
    """
    path = pathlib.Path(path)
    if is_torch_checkpoint(path):
        from some_tpu.compat.torch_ckpt import load_torch_checkpoint
        variables = load_torch_checkpoint(path)
        return {"meta": {"format": "torch-converted", "step": 0},
                "params": variables["params"],
                "batch_stats": variables["batch_stats"],
                "opt_state": None}
    return load_native_checkpoint(path)


def simplify_checkpoint(in_path: pathlib.Path | str,
                        out_path: pathlib.Path | str) -> None:
    """Strip optimizer state, keeping only inference weights
    (reference counterpart: simplify.py:7-21)."""
    ckpt = load_any_checkpoint(in_path)
    payload = {"meta": ckpt["meta"], "params": ckpt["params"],
               "batch_stats": ckpt.get("batch_stats") or {}, "opt_state": None}
    pathlib.Path(out_path).write_bytes(serialization.msgpack_serialize(payload))


class CheckpointManager:
    def __init__(self, work_dir: pathlib.Path | str, keep_top_k: int = 5,
                 permanent_start: int = 0, permanent_interval: int = 0):
        self.work_dir = pathlib.Path(work_dir)
        self.keep_top_k = keep_top_k
        self.permanent_start = permanent_start or 0
        self.permanent_interval = permanent_interval or 0
        # mirror of the reference's odd guard (training_utils.py:193)
        self.enable_permanent = self.permanent_start > 0 and self.permanent_interval > 9

    def is_permanent(self, step: int) -> bool:
        return (self.enable_permanent and step >= self.permanent_start
                and (step - self.permanent_start) % self.permanent_interval == 0)

    def save(self, step: int, params, batch_stats=None, opt_state=None,
             extra_meta: Dict | None = None) -> pathlib.Path:
        path = save_checkpoint(self.work_dir, step, params, batch_stats,
                               opt_state, extra_meta)
        self.prune()
        return path

    def prune(self) -> None:
        ckpts = list_checkpoints(self.work_dir)
        deletable = [(s, p) for s, p in ckpts if not self.is_permanent(s)]
        while len(deletable) > self.keep_top_k:
            step, path = deletable.pop(0)
            path.unlink(missing_ok=True)

    def restore_latest(self):
        path = latest_checkpoint(self.work_dir)
        return load_any_checkpoint(path) if path else None

"""Host-side collation with XLA-friendly shape bucketing.

collate_nd pads a list of Nd arrays on the first axis and stacks
(reference: utils/__init__.py:25-34). pad_to_bucket additionally rounds the
time axis (and optionally the batch axis) up to a bucket grid so XLA compiles
one executable per bucket instead of one per distinct length — the static-
shape discipline the torch reference doesn't need but TPUs do (SURVEY.md §7.3).
"""
from __future__ import annotations

from typing import List, Sequence

import numpy as np


def collate_nd(values: Sequence[np.ndarray], pad_value=0, max_len: int | None = None
               ) -> np.ndarray:
    """Pad along axis 0 to the max (or given) length and stack."""
    values = [np.asarray(v) for v in values]
    length = max(v.shape[0] for v in values) if max_len is None else max_len
    shape = (len(values), length, *values[0].shape[1:])
    out = np.full(shape, pad_value, dtype=values[0].dtype)
    for i, v in enumerate(values):
        out[i, :v.shape[0]] = v
    return out


def round_up(x: int, multiple: int) -> int:
    return ((x + multiple - 1) // multiple) * multiple


def bucket_length(n: int, grid: int = 128, min_len: int | None = None) -> int:
    """Round a sequence length up to the bucket grid."""
    out = round_up(max(n, 1), grid)
    if min_len is not None:
        out = max(out, min_len)
    return out


def bucket_batch_size(b: int) -> int:
    """Round a batch size up to the next power of two (bounded shape count)."""
    out = 1
    while out < b:
        out *= 2
    return out


def pad_to_bucket(batch: dict, length_grid: int = 128, pad_batch: bool = True,
                  min_batch: int = 1,
                  length_keys: tuple = ("units", "pitch", "unit2note"),
                  note_keys: tuple = ("note_midi", "note_rest", "note_dur"),
                  note_pad_values: dict | None = None,
                  common: dict | None = None) -> dict:
    """Pad all tensors in a collated batch up to bucketed static shapes.

    Adds 'mask' [B, T] (True on real frames) and 'batch_mask' [B] (True on
    real rows) if not present.

    ``common`` (multi-host): raw cross-rank maxima ``{"t": frames, "b": rows,
    "n": notes}`` — every rank's batch is padded as if those maxima were its
    own, so all processes of a global mesh compile/feed identical shapes and
    't_real' (the loss-normalization length) agrees globally. An optional
    ``b_multiple`` forces the padded row count to a multiple (e.g. the
    process count x local device count, so a replicated validation batch
    splits evenly over any process count — including non-powers-of-two).
    """
    note_pad_values = note_pad_values or {}
    out = dict(batch)
    any_seq = out[length_keys[0]]
    B, T = any_seq.shape[0], any_seq.shape[1]
    T_tgt = max(T, int(common.get("t", T))) if common else T
    B_tgt = max(B, int(common.get("b", B))) if common else B
    T_pad = bucket_length(T_tgt, length_grid)
    B_pad = bucket_batch_size(max(B_tgt, min_batch)) if pad_batch else B_tgt
    if common and int(common.get("b_multiple", 1)) > 1:
        B_pad = round_up(B_pad, int(common["b_multiple"]))

    def pad_arr(arr, target_t, pad_value=0):
        pads = [(0, B_pad - arr.shape[0]), (0, target_t - arr.shape[1])]
        pads += [(0, 0)] * (arr.ndim - 2)
        return np.pad(arr, pads, constant_values=pad_value)

    for key in length_keys:
        if key in out and out[key] is not None:
            out[key] = pad_arr(out[key], T_pad)
    if note_keys:
        note_t = max((out[k].shape[1] for k in note_keys if k in out), default=0)
        if common and note_t:
            note_t = max(note_t, int(common.get("n", note_t)))
        note_t_pad = bucket_length(note_t, max(length_grid // 4, 1)) if note_t else 0
        for key in note_keys:
            if key in out and out[key] is not None:
                out[key] = pad_arr(out[key], note_t_pad, note_pad_values.get(key, 0))

    if "mask" not in out:
        mask = np.zeros((B_pad, T_pad), dtype=bool)
        if "unit2note" in batch and batch["unit2note"] is not None:
            mask[:B, :T] = batch["unit2note"] > 0
        else:
            mask[:B, :T] = True
        out["mask"] = mask
    if "batch_mask" not in out:
        bm = np.zeros((B_pad,), dtype=bool)
        bm[:B] = True
        out["batch_mask"] = bm
    # pre-bucketing time length (what the torch reference's batch-max-T would
    # be — the cross-rank max in multi-host mode, so loss normalization
    # agrees globally), shape (1,) so shard_batch replicates it on-device
    out["t_real"] = np.full((1,), T_tgt, np.int32)
    out["size"] = B
    return out

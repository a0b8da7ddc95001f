"""Framewise -> note-level decoders, fully jittable with static shapes.

Behavioral equivalents of the reference decoders
(reference: utils/infer_utils.py:9-76), re-expressed for XLA:

* scatter_add over a data-dependent note count becomes ``segment_sum`` with
  the static bound ``num_segments = T + 1`` (a frame sequence of length T can
  contain at most T notes). Outputs are fixed-shape [B, T] arrays padded with
  zeros beyond the true note count, plus the count itself — the host slices.
* round() is round-half-to-even in both torch and jnp, so cumsum/round
  boundary decisions agree bit-for-bit given equal inputs.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def decode_gaussian_blurred_probs(probs: jnp.ndarray, vmin: float, vmax: float,
                                  deviation: float, threshold: float):
    """Soft-argmax over a +-3-sigma window around the peak bin.

    probs: [B, T, N] -> (values [B, T] float midi, rest [B, T] bool)
    (reference: utils/infer_utils.py:9-24)
    """
    num_bins = probs.shape[-1]
    interval = (vmax - vmin) / (num_bins - 1)
    width = int(3 * deviation / interval)
    idx = jnp.arange(num_bins)[None, None, :]
    idx_values = idx * interval + vmin
    center = jnp.argmax(probs, axis=-1, keepdims=True)
    start = jnp.clip(center - width, min=0)
    end = jnp.clip(center + width + 1, max=num_bins)
    window_mask = (idx >= start) & (idx < end)
    weights = probs * window_mask
    product_sum = jnp.sum(weights * idx_values, axis=2)
    weight_sum = jnp.sum(weights, axis=2)
    values = product_sum / (weight_sum + (weight_sum == 0))
    rest = jnp.max(probs, axis=-1) < threshold
    return values, rest


def decode_bounds_to_alignment(bounds: jnp.ndarray, use_diff: bool = True) -> jnp.ndarray:
    """Boundary probabilities [B, T] -> frame-to-note index map [B, T] (1-based).

    cumsum -> round -> increment detection -> cumsum
    (reference: utils/infer_utils.py:27-39).
    """
    bounds_step = jnp.round(jnp.cumsum(bounds, axis=1)).astype(jnp.int32)
    if use_diff:
        prev = jnp.concatenate(
            [jnp.full((bounds.shape[0], 1), -1, dtype=bounds_step.dtype),
             bounds_step[:, :-1]], axis=1)
        bounds_inc = (bounds_step - prev) > 0
    else:
        first = jnp.ones((bounds.shape[0], 1), dtype=bool)
        bounds_inc = jnp.concatenate(
            [first, bounds_step[:, 1:] > bounds_step[:, :-1]], axis=1)
    return jnp.cumsum(bounds_inc.astype(jnp.int32), axis=1)


def _decode_notes_single(frame2item: jnp.ndarray, values: jnp.ndarray,
                         masks: jnp.ndarray, threshold: float):
    """Single sequence [T] -> fixed-shape note arrays [T]."""
    T = frame2item.shape[0]
    num_seg = T + 1  # static upper bound: note ids are 1..T, slot 0 is padding
    ones = jnp.ones_like(frame2item)
    masks_i = masks.astype(jnp.int32)

    item_dur = jax.ops.segment_sum(ones, frame2item, num_segments=num_seg)[1:]
    item_unmasked = jax.ops.segment_sum(masks_i, frame2item, num_segments=num_seg)[1:]
    safe_dur = item_dur + (item_dur == 0)
    item_masks = (item_unmasked / safe_dur) >= threshold

    values_quant = jnp.clip(jnp.round(values).astype(jnp.int32), 0, 127)
    hist_ids = frame2item * 128 + values_quant
    histogram = jax.ops.segment_sum(
        ones * masks_i, hist_ids, num_segments=num_seg * 128
    ).reshape(num_seg, 128)[1:]
    item_center = jnp.argmax(histogram, axis=1).astype(values.dtype)  # [T]
    center_padded = jnp.concatenate([jnp.zeros((1,), values.dtype), item_center])
    values_center = center_padded[frame2item]  # gather per frame
    near_center = masks & (values >= values_center - 0.5) & (values <= values_center + 0.5)

    item_valid_dur = jax.ops.segment_sum(
        near_center.astype(jnp.int32), frame2item, num_segments=num_seg)[1:]
    item_values_sum = jax.ops.segment_sum(
        values * near_center, frame2item, num_segments=num_seg)[1:]
    item_values = item_values_sum / (item_valid_dur + (item_valid_dur == 0))

    return item_values, item_dur, item_masks


def decode_note_sequence(frame2item: jnp.ndarray, values: jnp.ndarray,
                         masks: jnp.ndarray, threshold: float = 0.5):
    """Aggregate framewise values into notes.

    frame2item: [B, T] int (0 = padding), values: [B, T], masks: [B, T] bool.
    Returns (item_values, item_dur, item_masks) each of static shape [B, T]
    — valid entries are [:, :n_items] with n_items = frame2item.max()
    (reference: utils/infer_utils.py:42-76; the per-note histogram-mode +
    near-center averaging logic is preserved exactly).
    """
    fn = functools.partial(_decode_notes_single, threshold=threshold)
    return jax.vmap(fn)(frame2item, values, masks)

"""Training losses and metrics, as pure jittable functions.

* binary_emd_loss — L1 between cumsum/sqrt(T) boundary trains
  (reference: modules/losses/bound_loss.py:6-19).
* bce_with_logits — mean BCE over all elements including padding, matching
  torch.nn.BCEWithLogitsLoss default reduction as used by the continuous task
  (reference: training/me_task.py:74,107).
* cross_entropy_ignore — CE over 129 classes with ignore_index=-1
  (reference: training/me_quant_task.py:44,72).
* midi_accuracy_counts — the framewise accuracy counters behind the
  ``midi_acc`` metric (reference: modules/metrics/midi_acc.py:14-38); on a
  mesh the (correct, total) pair is psum'd, replacing torchmetrics
  dist_reduce_fx='sum'.
"""
from __future__ import annotations

import math

import jax.numpy as jnp


def binary_emd_loss(pred: jnp.ndarray, target: jnp.ndarray,
                    bidirectional: bool = False) -> jnp.ndarray:
    """pred, target: [B, T] boundary probability trains."""
    scale = math.sqrt(target.shape[1])
    loss = jnp.abs(jnp.cumsum(pred, axis=1) / scale
                   - jnp.cumsum(target, axis=1) / scale).mean()
    if bidirectional:
        loss = loss + jnp.abs(
            jnp.cumsum(pred[:, ::-1], axis=1) / scale
            - jnp.cumsum(target[:, ::-1], axis=1) / scale).mean()
        loss = loss / 2
    return loss


def boundary_loss(pred: jnp.ndarray, target: jnp.ndarray,
                  lambda_bce: float = 0.1) -> jnp.ndarray:
    """EMD + lambda * BCE on probabilities (reference: bound_loss.py:22-33;
    defined upstream but unused by the shipped tasks)."""
    emd = binary_emd_loss(pred, target)
    eps = 1e-7
    p = jnp.clip(pred, eps, 1 - eps)
    bce = -(target * jnp.log(p) + (1 - target) * jnp.log(1 - p)).mean()
    return emd + lambda_bce * bce


def bce_with_logits_elementwise(logits: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Numerically stable elementwise BCE-with-logits (no reduction)."""
    logits = logits.astype(jnp.float32)
    # max(x,0) - x*z + log(1+exp(-|x|))
    return (jnp.maximum(logits, 0) - logits * target
            + jnp.log1p(jnp.exp(-jnp.abs(logits))))


def bce_with_logits(logits: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Mean-reduced BCE-with-logits (torch BCEWithLogitsLoss default)."""
    return bce_with_logits_elementwise(logits, target).mean()


def binary_emd_per_row(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Per-row EMD loss [B]; mean over rows equals binary_emd_loss."""
    scale = math.sqrt(target.shape[1])
    return jnp.abs(jnp.cumsum(pred, axis=1) / scale
                   - jnp.cumsum(target, axis=1) / scale).mean(axis=1)


def binary_emd_per_row_masked(pred: jnp.ndarray, target: jnp.ndarray,
                              frame_w: jnp.ndarray, t_real: jnp.ndarray
                              ) -> jnp.ndarray:
    """Per-row EMD restricted to the first t_real frames.

    Matches the reference EMD (bound_loss.py:6-19) computed on a batch padded
    only to its max length — TPU bucket-padding frames (>= t_real) contribute
    nothing to the cumsum, the L1 sum, or the normalizers.
    """
    denom = jnp.maximum(t_real, 1.0)
    scale = jnp.sqrt(denom)
    diff = jnp.abs(jnp.cumsum(pred * frame_w, axis=1)
                   - jnp.cumsum(target * frame_w, axis=1)) / scale
    return (diff * frame_w).sum(axis=1) / denom


def cross_entropy_ignore(logits: jnp.ndarray, labels: jnp.ndarray,
                         ignore_index: int = -1) -> jnp.ndarray:
    """logits [B, T, C], labels [B, T] int; mean over non-ignored positions."""
    logits = logits.astype(jnp.float32)
    valid = labels != ignore_index
    safe_labels = jnp.where(valid, labels, 0)
    logz = jnp.log(jnp.sum(jnp.exp(logits - logits.max(-1, keepdims=True)), axis=-1))
    logz = logz + logits.max(-1)
    picked = jnp.take_along_axis(logits, safe_labels[..., None], axis=-1)[..., 0]
    nll = (logz - picked) * valid
    return nll.sum() / jnp.maximum(valid.sum(), 1)


def midi_accuracy_counts(midi_pred, rest_pred, midi_gt, rest_gt, mask=None,
                         tolerance: float = 0.5):
    """Returns (correct, total) int32 counters for the midi_acc metric."""
    midi_close = (~rest_pred) & (~rest_gt) & (jnp.abs(midi_pred - midi_gt) <= tolerance)
    overall = midi_close & (rest_pred == rest_gt)
    if mask is not None:
        overall = overall & mask
        total = mask.sum()
    else:
        total = midi_gt.size
    return overall.sum().astype(jnp.int32), jnp.asarray(total, dtype=jnp.int32)

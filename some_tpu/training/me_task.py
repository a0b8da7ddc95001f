"""Continuous MIDI-extraction task.

The reference builds gaussian-blurred soft pitch targets in the CPU collater
(reference: training/me_task.py:26-51); here the cheap target construction
moves into the jitted loss on device — the host pipeline ships only raw
note arrays, and XLA fuses the gaussian + gather into the backward pass.

Losses: BCE-with-logits on the blurred probs + cumsum-EMD on boundaries
(reference: training/me_task.py:72-111). Batch-row padding introduced by TPU
shape bucketing is excluded via 'batch_mask' weights; within-row frame
padding participates exactly as in the reference (whole-tensor mean).
"""
from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from some_tpu.data.collate import collate_nd, pad_to_bucket
from some_tpu.nn.model import build_midi_extractor
from some_tpu.training.base_task import BaseTask
from some_tpu.training import losses as L


def gaussian_note_targets(note_midi, note_rest, note_mask, unit2note,
                          midi_min: float, midi_max: float, num_bins: int,
                          deviation: float):
    """[B,N] note arrays -> framewise soft targets [B,T,num_bins].

    miu = (midi - vmin)/interval per note; probs = exp(-((x-miu)/sigma)^2/2)
    zeroed on rests/padding, scattered to frames by gathering along the
    unit2note alignment (0 = padding row).
    """
    interval = (midi_max - midi_min) / (num_bins - 1)
    sigma = deviation / interval
    miu = ((note_midi - midi_min) / interval)[:, :, None]          # [B,N,1]
    x = jnp.arange(num_bins, dtype=jnp.float32)[None, None, :]     # [1,1,K]
    probs = jnp.exp(-0.5 * ((x - miu) / sigma) ** 2)               # [B,N,K]
    keep = (note_mask & ~note_rest)[:, :, None]
    probs = probs * keep
    probs = jnp.pad(probs, ((0, 0), (1, 0), (0, 0)))               # pad row 0
    return jnp.take_along_axis(probs, unit2note[:, :, None], axis=1)


def bounds_from_alignment(unit2note):
    """unit2note [B,T] -> boundary train [B,T] float (diff > 0)."""
    prev = jnp.pad(unit2note[:, :-1], ((0, 0), (1, 0)))
    return ((unit2note - prev) > 0).astype(jnp.float32)


class MIDIExtractionTask(BaseTask):
    def __init__(self, config: dict):
        super().__init__(config)
        self.midi_min = config["midi_min"]
        self.midi_max = config["midi_max"]
        self.num_bins = config["midi_num_bins"]
        self.midi_deviation = config["midi_prob_deviation"]
        self.rest_threshold = config["rest_threshold"]
        self.use_bound_loss = config.get("use_bound_loss", True)
        self.use_midi_loss = config.get("use_midi_loss", True)
        # True (default): losses are computed over exactly the frames the
        # torch reference would see (batch padded to its max length), so
        # bucket-grid padding does not dilute the loss scale. False keeps
        # the round-1 whole-padded-tensor mean.
        self.loss_exclude_bucket_padding = config.get(
            "loss_exclude_bucket_padding", True)

    def _frame_weights(self, batch, t_pad: int):
        """(t_real float scalar, [T] 0/1 weights) or (None, None) in legacy
        whole-tensor-mean mode."""
        if not self.loss_exclude_bucket_padding or "t_real" not in batch:
            return None, None
        t_real = batch["t_real"][0]
        frame_w = (jnp.arange(t_pad) < t_real).astype(jnp.float32)
        return t_real.astype(jnp.float32), frame_w

    def build_model(self):
        # quantize="none": int8 is serving-only (zero-gradient round());
        # a work-dir config carrying the serving key must not degrade a
        # resumed training run
        return build_midi_extractor(self.config, dtype=self.compute_dtype,
                                    quantize="none")

    def model_inputs(self, batch) -> dict:
        return dict(x=batch["units"], f0=batch.get("pitch"), mask=batch["mask"])

    def compute_losses(self, outputs, batch) -> Dict[str, jnp.ndarray]:
        midi_logits, bounds_pred = outputs
        row_w = batch["batch_mask"].astype(jnp.float32)            # [B]
        n_rows = jnp.maximum(row_w.sum(), 1.0)

        t_real, frame_w = self._frame_weights(batch, midi_logits.shape[1])

        losses = {}
        if self.use_midi_loss:
            probs_target = gaussian_note_targets(
                batch["note_midi"], batch["note_rest"], batch["note_mask"],
                batch["unit2note"], self.midi_min, self.midi_max,
                self.num_bins, self.midi_deviation)
            per_elem = L.bce_with_logits_elementwise(midi_logits, probs_target)
            if frame_w is None:
                losses["midi_loss"] = (
                    (per_elem.mean(axis=(1, 2)) * row_w).sum() / n_rows)
            else:
                w = row_w[:, None, None] * frame_w[None, :, None]
                denom = n_rows * jnp.maximum(t_real, 1.0) * per_elem.shape[2]
                losses["midi_loss"] = (per_elem * w).sum() / denom
        if self.use_bound_loss:
            bounds_target = bounds_from_alignment(batch["unit2note"])
            if frame_w is None:
                per_row = L.binary_emd_per_row(bounds_pred, bounds_target)
            else:
                per_row = L.binary_emd_per_row_masked(
                    bounds_pred, bounds_target, frame_w, t_real)
            losses["bound_loss"] = (per_row * row_w).sum() / n_rows
        return losses

    # ---- validation: device-side decode + metric counters ----
    def valid_outputs(self, outputs, batch) -> dict:
        """Decode predictions and compute midi_acc counters on device
        (reference: training/me_task.py:115-154)."""
        import jax.numpy as jnp
        from some_tpu.ops.decode import (
            decode_bounds_to_alignment, decode_gaussian_blurred_probs,
            decode_note_sequence,
        )
        from some_tpu.training.losses import midi_accuracy_counts

        import jax
        midi_logits, bounds = outputs
        masks = batch["unit2note"] > 0
        probs = jax.nn.sigmoid(midi_logits.astype(jnp.float32)) * masks[..., None]
        bounds = bounds * masks

        frame2note = decode_bounds_to_alignment(bounds) * masks
        midi_pred, rest_pred = decode_gaussian_blurred_probs(
            probs, vmin=self.midi_min, vmax=self.midi_max,
            deviation=self.midi_deviation, threshold=self.rest_threshold)
        note_midi, note_dur, note_mask = decode_note_sequence(
            frame2note, midi_pred, (~rest_pred) & masks)

        # framewise ground truth midi (rest -> -inf) gathered via alignment
        gt = jnp.where(batch["note_rest"], -jnp.inf, batch["note_midi"])
        gt = jnp.pad(gt, ((0, 0), (1, 0)), constant_values=-jnp.inf)
        midi_gt = jnp.take_along_axis(gt, batch["unit2note"], axis=1)
        row_mask = masks & batch["batch_mask"][:, None]
        correct, total = midi_accuracy_counts(
            jnp.where(rest_pred, -jnp.inf, midi_pred), rest_pred,
            midi_gt, midi_gt < 0, mask=row_mask, tolerance=0.5)
        return {
            "probs": probs, "bounds": bounds,
            "note_midi": note_midi, "note_dur": note_dur,
            "note_rest": ~note_mask, "n_notes": frame2note.max(axis=1),
            "midi_pred": jnp.where(rest_pred, -jnp.inf, midi_pred),
            "midi_gt": midi_gt,
            "midi_acc_correct": correct, "midi_acc_total": total,
        }

    def validation_plots(self, trainer, batch_idx: int, batch: dict,
                         extras: dict, step: int) -> None:
        """Host-side matplotlib figures (reference: training/me_task.py:159-196)."""
        import numpy as np
        from some_tpu.training.me_task import gaussian_note_targets
        from some_tpu.utils import plot as P

        if trainer.log_writer is None:
            return
        w = trainer.log_writer
        probs_pred = np.asarray(extras["probs"])[0]
        probs_gt = np.asarray(gaussian_note_targets(
            batch["note_midi"], batch["note_rest"], batch["note_mask"],
            batch["unit2note"], self.midi_min, self.midi_max,
            self.num_bins, self.midi_deviation))[0]
        spec_cat = np.concatenate(
            [np.abs(probs_pred - probs_gt), probs_gt, probs_pred], axis=-1)
        w.add_figure(f"prob/{batch_idx}", P.spec_to_figure(spec_cat, 0, 1), step)

        n = int(np.asarray(extras["n_notes"])[0])
        bounds_gt = (np.diff(np.asarray(batch["unit2note"])[0],
                             prepend=0) > 0).astype(np.float32)
        w.add_figure(f"boundary/{batch_idx}", P.boundary_to_figure(
            bounds_gt, np.asarray(extras["bounds"])[0],
            np.asarray(batch["note_dur"])[0], np.asarray(extras["note_dur"])[0][:n],
        ), step)
        w.add_figure(f"midi/{batch_idx}", P.curve_to_figure(
            np.asarray(extras["midi_gt"])[0], np.asarray(extras["midi_pred"])[0],
            curve_base=np.asarray(batch["pitch"])[0], grid=1, base_label="pitch",
        ), step)
        w.add_figure(f"final/{batch_idx}", P.pitch_notes_to_figure(
            np.asarray(batch["pitch"])[0],
            np.asarray(batch["note_midi"])[0], np.asarray(batch["note_dur"])[0],
            np.asarray(batch["note_rest"])[0],
            np.asarray(extras["note_midi"])[0][:n],
            np.asarray(extras["note_dur"])[0][:n],
            np.asarray(extras["note_rest"])[0][:n],
        ), step)

    # ---- host collation ----
    def collate(self, items: list, common: dict | None = None) -> dict:
        batch = {
            "units": collate_nd([i["units"] for i in items]),
            "pitch": collate_nd([i["pitch"] for i in items]),
            "note_midi": collate_nd([i["note_midi"] for i in items]),
            "note_rest": collate_nd([i["note_rest"] for i in items]),
            "note_dur": collate_nd([i["note_dur"] for i in items]),
            "unit2note": collate_nd([i["unit2note"] for i in items]),
            "note_mask": collate_nd(
                [np.ones(len(i["note_midi"]), dtype=bool) for i in items]),
        }
        return pad_to_bucket(
            batch,
            length_grid=int(self.config.get("frame_bucket_grid", 128)),
            min_batch=self.dp_size,
            length_keys=("units", "pitch", "unit2note"),
            note_keys=("note_midi", "note_rest", "note_dur", "note_mask"),
            common=common,
        )

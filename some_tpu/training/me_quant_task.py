"""Quantized MIDI-extraction task: integer pitch classes + rest class 128.

CE loss over 129 classes with ignore_index=-1 on framewise labels gathered
through the unit2note alignment (reference: training/me_quant_task.py:13-77).
TPU delta: the gather happens on device inside the jitted loss; batch rows
added by shape bucketing carry label -1 everywhere and are ignored by the CE.
"""
from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from some_tpu.data.collate import collate_nd, pad_to_bucket
from some_tpu.training import losses as L
from some_tpu.training.me_task import MIDIExtractionTask, bounds_from_alignment


def framewise_labels(note_midi, unit2note, ignore_index: int = -1):
    """[B,N] int labels -> [B,T] via alignment gather; slot 0 = ignore."""
    padded = jnp.pad(note_midi, ((0, 0), (1, 0)), constant_values=ignore_index)
    return jnp.take_along_axis(padded, unit2note, axis=1)


class QuantizedMIDIExtractionTask(MIDIExtractionTask):
    def __init__(self, config: dict):
        # quant configs lack the continuous-only keys; default them
        config.setdefault("midi_prob_deviation", 1.0)
        config.setdefault("rest_threshold", 0.1)
        super().__init__(config)

    def compute_losses(self, outputs, batch) -> Dict[str, jnp.ndarray]:
        midi_logits, bounds_pred = outputs
        row_w = batch["batch_mask"].astype(jnp.float32)
        n_rows = jnp.maximum(row_w.sum(), 1.0)

        losses = {}
        if self.use_midi_loss:
            labels = framewise_labels(batch["note_midi"], batch["unit2note"])
            labels = jnp.where(batch["batch_mask"][:, None], labels, -1)
            losses["midi_loss"] = L.cross_entropy_ignore(midi_logits, labels)
        if self.use_bound_loss:
            bounds_target = bounds_from_alignment(batch["unit2note"])
            t_real, frame_w = self._frame_weights(batch, bounds_pred.shape[1])
            if frame_w is None:
                per_row = L.binary_emd_per_row(bounds_pred, bounds_target)
            else:
                per_row = L.binary_emd_per_row_masked(
                    bounds_pred, bounds_target, frame_w, t_real)
            losses["bound_loss"] = (per_row * row_w).sum() / n_rows
        return losses

    def valid_outputs(self, outputs, batch) -> dict:
        """Argmax decode + midi_acc counters (reference: me_quant_task.py:79-120)."""
        import jax
        import jax.numpy as jnp
        from some_tpu.ops.decode import (
            decode_bounds_to_alignment, decode_note_sequence,
        )
        from some_tpu.training.losses import midi_accuracy_counts

        midi_logits, bounds = outputs
        masks = batch["unit2note"] > 0
        probs = jax.nn.softmax(midi_logits.astype(jnp.float32), axis=-1)
        probs = probs * masks[..., None]
        bounds = bounds * masks

        frame2note = decode_bounds_to_alignment(bounds) * masks
        midi_idx = jnp.argmax(probs, axis=-1)
        rest_pred = midi_idx == 128
        midi_pred = jnp.where(rest_pred, -jnp.inf, midi_idx.astype(jnp.float32))
        note_midi, note_dur, note_mask = decode_note_sequence(
            frame2note, jnp.clip(midi_idx, 0, 127).astype(jnp.float32),
            (~rest_pred) & masks)

        gt_notes = batch["note_midi"].astype(jnp.float32)
        gt_notes = jnp.where(batch["note_midi"] == 128, -jnp.inf, gt_notes)
        gt = jnp.pad(gt_notes, ((0, 0), (1, 0)), constant_values=-jnp.inf)
        midi_gt = jnp.take_along_axis(gt, batch["unit2note"], axis=1)
        row_mask = masks & batch["batch_mask"][:, None]
        correct, total = midi_accuracy_counts(
            midi_pred, rest_pred, midi_gt, midi_gt < 0, mask=row_mask, tolerance=0.5)
        return {
            "probs": probs[..., :-1], "bounds": bounds,
            "note_midi": note_midi, "note_dur": note_dur,
            "note_rest": ~note_mask, "n_notes": frame2note.max(axis=1),
            "midi_pred": midi_pred, "midi_gt": midi_gt,
            "midi_acc_correct": correct, "midi_acc_total": total,
        }

    def validation_plots(self, trainer, batch_idx, batch, extras, step):
        import numpy as np
        from some_tpu.utils import plot as P
        if trainer.log_writer is None:
            return
        w = trainer.log_writer
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
            np.asarray(batch["note_midi"])[0] == 128,
            np.asarray(extras["note_midi"])[0][:n],
            np.asarray(extras["note_dur"])[0][:n],
            np.asarray(extras["note_rest"])[0][:n],
        ), step)

    def collate(self, items: list, common: dict | None = None) -> dict:
        batch = {
            "units": collate_nd([i["units"] for i in items]),
            "pitch": collate_nd([i["pitch"] for i in items]),
            "note_midi": collate_nd([i["note_midi"] for i in items], pad_value=-1),
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
            note_keys=("note_midi", "note_dur", "note_mask"),
            note_pad_values={"note_midi": -1},
            common=common,
        )

"""Quantized-model inference: softmax + argmax decode, rest class 128
(reference: inference/me_quant_infer.py:10-38)."""
from __future__ import annotations

import jax.numpy as jnp

from some_tpu.inference.me_infer import MIDIExtractionInference
from some_tpu.ops.decode import decode_bounds_to_alignment, decode_note_sequence


class QuantizedMIDIExtractionInference(MIDIExtractionInference):
    def __init__(self, config: dict, model_path, **kwargs):
        config.setdefault("midi_prob_deviation", 1.0)
        config.setdefault("rest_threshold", 0.1)
        super().__init__(config, model_path, **kwargs)

    def _forward(self, variables, units, mask):
        probs, bounds = self.model.apply(
            variables, units, f0=None, mask=mask, softmax=True)
        return probs, bounds

    def _decode(self, probs, bounds, mask):
        maskf = mask.astype(probs.dtype)
        probs = probs * maskf[..., None]
        bounds = bounds * maskf
        frame2note = decode_bounds_to_alignment(bounds) * mask
        midi = jnp.argmax(probs, axis=-1)
        rest = midi == 128
        note_midi, note_dur, note_mask = decode_note_sequence(
            frame2note, jnp.clip(midi, 0, 127).astype(jnp.float32),
            (~rest) & mask)
        n_notes = frame2note.max(axis=1)
        return {"note_midi": note_midi, "note_dur": note_dur,
                "note_rest": ~note_mask, "n_notes": n_notes}

"""Shared wav->notes front pipeline for every serving surface.

infer.py, webui.py, and serve.py all run the same recipe — decode, silence
slicing with the production slicer settings, engine.infer, SMF assembly
(reference: infer.py:33-47, webui.py:43-67). This module is the single
definition of that recipe and its magic values so the three surfaces cannot
silently diverge.
"""
from __future__ import annotations

from typing import Dict, List

import numpy as np

#: Input-length cap shared by the interactive surfaces (reference webui.py:43-44).
MAX_DURATION_SEC = 20 * 60

#: Longest silence (ms) kept around each chunk — the production slicer
#: setting every surface uses (reference infer.py:35).
MAX_SIL_KEPT_MS = 1000


def slice_waveform(waveform: np.ndarray, sr: int) -> List[dict]:
    """Silence-slice a mono waveform into phrase chunks with offsets."""
    from some_tpu.audio.slicer import SilenceSlicer

    return SilenceSlicer(sr=sr, max_sil_kept=MAX_SIL_KEPT_MS).slice(waveform)


def transcribe_waveform(engine, waveform: np.ndarray, sr: int,
                        tempo: float = 120):
    """Full waveform -> MidiFile through a prepared inference engine."""
    from some_tpu.utils.midi_file import build_midi_file

    chunks = slice_waveform(waveform, sr)
    segments = engine.infer([c["waveform"] for c in chunks])
    return build_midi_file([c["offset"] for c in chunks], segments,
                           tempo=tempo)


def segment_to_json(offset: float, seg: dict) -> Dict[str, object]:
    """One segment in the wire schema shared by serve.py's ?format=json and
    stream.py's NDJSON events — the single definition of the field names."""
    return {
        "offset_sec": float(offset),
        "note_midi": np.asarray(seg["note_midi"], float).tolist(),
        "note_dur_sec": np.asarray(seg["note_dur"], float).tolist(),
        "note_rest": np.asarray(seg["note_rest"], bool).tolist(),
    }


def segments_to_json(offsets, segments, tempo: float) -> Dict[str, object]:
    """JSON-safe note arrays (the serve.py ?format=json wire schema)."""
    return {"segments": [segment_to_json(o, s)
                         for o, s in zip(offsets, segments)],
            "tempo": tempo}

"""Note-level transcription metrics: onset / onset+pitch / onset+offset F1.

The reference's only quality metric is framewise ``midi_acc``
(reference: modules/metrics/midi_acc.py); the project north star is
*note-level* onset/pitch F1 parity against published checkpoints
(BASELINE.md). This implements the standard transcription-F1 protocol
(mir_eval.transcription semantics): greedy one-to-one matching of predicted
to reference notes, onset within ``onset_tolerance`` seconds, pitch within
``pitch_tolerance`` semitones, optional offset criterion (max of
``offset_ratio`` x duration and ``offset_min_tolerance``).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence, Tuple

import numpy as np


@dataclass
class NoteF1:
    precision: float
    recall: float
    f1: float
    n_pred: int
    n_ref: int
    n_match: int


def notes_to_intervals(note_midi: Sequence[float], note_dur: Sequence[float],
                       note_rest: Sequence[bool]):
    """Note dicts (per-chunk engine output) -> (onsets, offsets, pitches),
    rests dropped."""
    onsets, offsets, pitches = [], [], []
    t = 0.0
    for midi, dur, rest in zip(note_midi, note_dur, note_rest):
        if not rest:
            onsets.append(t)
            offsets.append(t + dur)
            pitches.append(midi)
        t += dur
    return np.asarray(onsets), np.asarray(offsets), np.asarray(pitches)


def match_notes(ref: Tuple[np.ndarray, np.ndarray, np.ndarray],
                pred: Tuple[np.ndarray, np.ndarray, np.ndarray],
                onset_tolerance: float = 0.05,
                pitch_tolerance: float = 0.5,
                offset_ratio: float | None = None,
                offset_min_tolerance: float = 0.05) -> List[Tuple[int, int]]:
    """Greedy matching by onset distance among all valid candidate pairs."""
    r_on, r_off, r_pitch = ref
    p_on, p_off, p_pitch = pred
    candidates = []
    for i in range(len(r_on)):
        for j in range(len(p_on)):
            if abs(r_on[i] - p_on[j]) > onset_tolerance:
                continue
            if abs(r_pitch[i] - p_pitch[j]) > pitch_tolerance:
                continue
            if offset_ratio is not None:
                tol = max(offset_ratio * (r_off[i] - r_on[i]), offset_min_tolerance)
                if abs(r_off[i] - p_off[j]) > tol:
                    continue
            candidates.append((abs(r_on[i] - p_on[j]), i, j))
    candidates.sort()
    matched_r, matched_p, matches = set(), set(), []
    for _, i, j in candidates:
        if i in matched_r or j in matched_p:
            continue
        matched_r.add(i)
        matched_p.add(j)
        matches.append((i, j))
    return matches


def note_f1(ref, pred, onset_tolerance: float = 0.05,
            pitch_tolerance: float = 0.5, offset_ratio: float | None = None,
            offset_min_tolerance: float = 0.05) -> NoteF1:
    matches = match_notes(ref, pred, onset_tolerance, pitch_tolerance,
                          offset_ratio, offset_min_tolerance)
    n_ref, n_pred, n_match = len(ref[0]), len(pred[0]), len(matches)
    precision = n_match / n_pred if n_pred else 0.0
    recall = n_match / n_ref if n_ref else 0.0
    f1 = (2 * precision * recall / (precision + recall)
          if precision + recall else 0.0)
    return NoteF1(precision, recall, f1, n_pred, n_ref, n_match)


def segments_f1(ref_segments: List[dict], pred_segments: List[dict],
                ref_offsets: Sequence[float], pred_offsets: Sequence[float],
                **kwargs) -> NoteF1:
    """F1 over whole songs assembled from per-chunk segment dicts."""
    def flatten(segments, offsets):
        ons, offs, pitches = [], [], []
        for seg, off in zip(segments, offsets):
            o, f, p = notes_to_intervals(seg["note_midi"], seg["note_dur"],
                                         seg["note_rest"])
            ons.append(o + off)
            offs.append(f + off)
            pitches.append(p)
        return (np.concatenate(ons) if ons else np.zeros(0),
                np.concatenate(offs) if offs else np.zeros(0),
                np.concatenate(pitches) if pitches else np.zeros(0))

    return note_f1(flatten(ref_segments, ref_offsets),
                   flatten(pred_segments, pred_offsets), **kwargs)

"""Compare two MIDI files note-for-note (parity / regression tool).

Usage: python tools/compare_midi.py a.mid b.mid [--onset-tol 0.05]

Reports exact tick-level equality plus tolerance-based note F1 — the
"bit-for-note" check for validating SOME-TPU output against reference
output on the same audio.
"""
import argparse
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402

from some_tpu.utils.midi_file import MidiFile  # noqa: E402
from some_tpu.utils.note_f1 import note_f1  # noqa: E402


def midi_notes_to_arrays(path, tempo=120.0):
    mf = MidiFile.load(path)
    ticks_per_sec = mf.ticks_per_beat * tempo / 60.0
    notes = mf.notes()
    on = np.array([n["start_tick"] / ticks_per_sec for n in notes])
    off = np.array([n["end_tick"] / ticks_per_sec for n in notes])
    pitch = np.array([float(n["note"]) for n in notes])
    return (on, off, pitch), notes


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("ref")
    parser.add_argument("pred")
    parser.add_argument("--onset-tol", type=float, default=0.05)
    parser.add_argument("--pitch-tol", type=float, default=0.5)
    parser.add_argument("--tempo", type=float, default=120.0)
    args = parser.parse_args()

    ref_arrays, ref_notes = midi_notes_to_arrays(args.ref, args.tempo)
    pred_arrays, pred_notes = midi_notes_to_arrays(args.pred, args.tempo)

    exact = ref_notes == pred_notes
    print(f"exact tick-level match: {exact} "
          f"({len(ref_notes)} vs {len(pred_notes)} notes)")
    result = note_f1(ref_arrays, pred_arrays, onset_tolerance=args.onset_tol,
                     pitch_tolerance=args.pitch_tol)
    print(f"onset+pitch F1: {result.f1:.4f} "
          f"(P={result.precision:.4f} R={result.recall:.4f}, "
          f"{result.n_match}/{result.n_ref} matched)")
    return 0 if exact else 1


if __name__ == "__main__":
    sys.exit(main())

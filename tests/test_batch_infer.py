"""Word-alignment logic used by dataset labeling (batch_infer)."""
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

from batch_infer import (  # noqa: E402
    align_to_words, calc_seq, label_row, max_overlap_note, overlapping_notes,
    word_windows,
)


def test_calc_seq():
    assert calc_seq(60.0, False) == "C4"
    assert calc_seq(60.3, False) == "C4+30"
    assert calc_seq(59.75, False) == "C4-25"
    assert calc_seq(60.0, True) == "rest"


def test_word_windows():
    ph_dur = [0.1, 0.2, 0.3, 0.4]
    ph_num = [2, 1, 1]
    assert word_windows(ph_dur, ph_num) == [
        (0.0, 0.3), (0.3, 0.6), (0.6, 1.0)]


def test_align_to_words_snaps_and_drops():
    windows = [(0.0, 0.5), (0.5, 1.0)]
    notes = [
        {"start_time": 0.02, "end_time": 0.48, "note_seq": "C4", "note_dur": 0.46},
        {"start_time": 0.52, "end_time": 0.55, "note_seq": "D4", "note_dur": 0.03},
    ]
    out = align_to_words(notes, windows, tolerance=0.05)
    # first note snaps to (0.0, 0.5)
    assert out[0]["start_time"] == 0.0 and out[0]["end_time"] == 0.5
    # second note snaps both edges to 0.5 -> zero duration -> dropped
    assert len(out) == 1


def test_overlap_helpers():
    notes = [
        {"start_time": 0.0, "end_time": 0.4, "note_seq": "C4", "note_dur": 0.4},
        {"start_time": 0.4, "end_time": 1.0, "note_seq": "E4", "note_dur": 0.6},
    ]
    got = overlapping_notes((0.3, 0.8), notes)
    assert [n["note_seq"] for n in got] == ["C4", "E4"]
    assert max_overlap_note((0.3, 0.8), notes) == "E4"
    assert max_overlap_note((5.0, 6.0), notes) == "rest"


def test_label_row_continuous_fills_words():
    row = {"name": "x", "ph_seq": "a b c", "ph_dur": "0.5 0.5", "ph_num": "1 1"}
    notes = [
        {"start_time": 0.0, "end_time": 0.5, "note_seq": "C4", "note_dur": 0.5},
        {"start_time": 0.5, "end_time": 0.8, "note_seq": "D4", "note_dur": 0.3},
    ]
    label_row(row, notes, round_midi=False)
    seq = row["note_seq"].split()
    dur = [float(d) for d in row["note_dur"].split()]
    assert seq == ["C4", "D4", "rest"]
    assert dur == pytest.approx([0.5, 0.3, 0.2])
    assert sum(dur) == pytest.approx(1.0)


def test_label_row_round_midi_single_note_per_word():
    row = {"name": "x", "ph_seq": "a b", "ph_dur": "0.6 0.4", "ph_num": "1 1"}
    notes = [
        {"start_time": 0.0, "end_time": 0.45, "note_seq": "C4", "note_dur": 0.45},
        {"start_time": 0.45, "end_time": 1.0, "note_seq": "E4", "note_dur": 0.55},
    ]
    label_row(row, notes, round_midi=True)
    assert row["note_seq"].split() == ["C4", "E4"]
    assert [float(d) for d in row["note_dur"].split()] == pytest.approx([0.6, 0.4])

import numpy as np
import pytest

from some_tpu.utils.note_f1 import note_f1, notes_to_intervals


def test_perfect_match():
    ref = (np.array([0.0, 1.0, 2.0]), np.array([0.9, 1.9, 2.9]),
           np.array([60.0, 62.0, 64.0]))
    out = note_f1(ref, ref)
    assert out.f1 == 1.0 and out.n_match == 3


def test_onset_tolerance():
    ref = (np.array([0.0]), np.array([1.0]), np.array([60.0]))
    pred_close = (np.array([0.04]), np.array([1.0]), np.array([60.0]))
    pred_far = (np.array([0.08]), np.array([1.0]), np.array([60.0]))
    assert note_f1(ref, pred_close).f1 == 1.0
    assert note_f1(ref, pred_far).f1 == 0.0


def test_pitch_tolerance():
    ref = (np.array([0.0]), np.array([1.0]), np.array([60.0]))
    assert note_f1(ref, (np.array([0.0]), np.array([1.0]), np.array([60.4]))).f1 == 1.0
    assert note_f1(ref, (np.array([0.0]), np.array([1.0]), np.array([61.0]))).f1 == 0.0


def test_one_to_one_matching():
    """Two predictions near one reference: only one may match."""
    ref = (np.array([0.0]), np.array([1.0]), np.array([60.0]))
    pred = (np.array([0.01, 0.02]), np.array([1.0, 1.0]), np.array([60.0, 60.0]))
    out = note_f1(ref, pred)
    assert out.n_match == 1
    assert out.precision == 0.5 and out.recall == 1.0


def test_offset_criterion():
    ref = (np.array([0.0]), np.array([1.0]), np.array([60.0]))
    pred = (np.array([0.0]), np.array([0.5]), np.array([60.0]))
    assert note_f1(ref, pred).f1 == 1.0  # offsets ignored by default
    assert note_f1(ref, pred, offset_ratio=0.2).f1 == 0.0
    pred_ok = (np.array([0.0]), np.array([0.85]), np.array([60.0]))
    assert note_f1(ref, pred_ok, offset_ratio=0.2).f1 == 1.0


def test_notes_to_intervals_skips_rests():
    on, off, pitch = notes_to_intervals(
        [60.0, 0.0, 64.0], [0.5, 0.3, 0.7], [False, True, False])
    np.testing.assert_allclose(on, [0.0, 0.8])
    np.testing.assert_allclose(off, [0.5, 1.5])
    np.testing.assert_allclose(pitch, [60.0, 64.0])

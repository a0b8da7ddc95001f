"""Native C++ audio frontend vs the pure-python reference implementation."""
import numpy as np
import pytest

from some_tpu.audio.slicer import SilenceSlicer, rms_envelope
from some_tpu.native import get_lib, rms_envelope_native, slicer_scan_native

pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="native library unavailable (no g++?)")


def make_signal(rng, seconds=20, sr=44100):
    """Alternating tone/silence segments with random durations."""
    parts = []
    t_left = seconds
    while t_left > 0:
        dur = float(rng.uniform(0.3, 4.0))
        dur = min(dur, t_left)
        n = int(dur * sr)
        if rng.random() < 0.45:
            parts.append(np.zeros(n, np.float32))
        else:
            freq = rng.uniform(100, 800)
            t = np.arange(n) / sr
            parts.append((0.3 * np.sin(2 * np.pi * freq * t)).astype(np.float32))
        t_left -= dur
    return np.concatenate(parts)


def test_rms_envelope_matches_python(rng):
    y = make_signal(rng, seconds=8)
    ref = rms_envelope(y, frame_length=3528, hop_length=882)
    out = rms_envelope_native(y, 3528, 882)
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_scan_matches_python(seed):
    rng = np.random.default_rng(seed)
    y = make_signal(rng, seconds=25)
    slicer = SilenceSlicer(sr=44100, max_sil_kept=1000)
    rms = rms_envelope(y, frame_length=slicer.win_size, hop_length=slicer.hop_size)
    ref_tags = slicer._scan_python(rms)
    native_tags = slicer_scan_native(
        rms, slicer.threshold, slicer.min_interval, slicer.min_length,
        slicer.max_sil_kept)
    assert native_tags == [(int(a), int(b)) for a, b in ref_tags]


@pytest.mark.parametrize("seed", [7, 8])
def test_full_slice_native_vs_python(seed):
    rng = np.random.default_rng(seed)
    y = make_signal(rng, seconds=30)
    slicer = SilenceSlicer(sr=44100, max_sil_kept=1000)
    native_chunks = slicer.slice(y)  # uses the native path when available

    # force the python path
    rms = rms_envelope(y, frame_length=slicer.win_size, hop_length=slicer.hop_size)
    py_chunks = slicer._apply_tags(y, slicer._scan_python(rms), rms.shape[0])
    assert len(native_chunks) == len(py_chunks)
    for a, b in zip(native_chunks, py_chunks):
        assert a["offset"] == b["offset"]
        np.testing.assert_array_equal(a["waveform"], b["waveform"])

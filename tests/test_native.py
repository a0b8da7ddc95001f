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


def test_decimate_fir_matches_scipy():
    """The C++ phase-decomposed FIR decimator (audio_frontend.cpp) must
    match scipy.signal.resample_poly with the same odd gain-1 taps — the
    behavioral spec of the wire_sr hot path (wavio.decimate_wire)."""
    from scipy.signal import resample_poly

    from some_tpu.audio.wavio import wire_decimation_taps
    from some_tpu.native import decimate_fir_native

    if get_lib() is None:
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(3)
    taps = wire_decimation_taps(2)
    for n in (7, 64, 129, 130, 1000, 44100 * 3 + 1):
        x = rng.standard_normal(n).astype(np.float32)
        ref = resample_poly(x, 1, 2, window=taps).astype(np.float32)
        got = decimate_fir_native(x, taps, 2)
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=1e-5)
    # generic factor (the ABI takes any integer factor)
    from scipy.signal import firwin
    t3 = firwin(64 * 3 + 1, 1 / 3, window=("kaiser", 12.0)).astype(np.float32)
    x = rng.standard_normal(100001).astype(np.float32)
    ref = resample_poly(x, 1, 3, window=t3).astype(np.float32)
    got = decimate_fir_native(x, t3, 3)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_decimate_wire_uses_native_or_scipy_identically():
    """decimate_wire output is backend-independent (native fast path vs
    scipy fallback) within f32 reassociation noise."""
    from scipy.signal import resample_poly

    from some_tpu.audio.wavio import decimate_wire, wire_decimation_taps

    rng = np.random.default_rng(4)
    x = rng.standard_normal(44100).astype(np.float32)
    out = decimate_wire(x, 2)
    ref = resample_poly(x, 1, 2, window=wire_decimation_taps(2)).astype(np.float32)
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=1e-5)
    assert np.array_equal(decimate_wire(x, 1), x)

"""Live streaming transcription equals the offline pipeline.

The stream drives the exact offline silence-scan incrementally
(some_tpu/inference/streaming.py), so chunk boundaries — and the notes —
must be identical to running the whole file through slice+infer at once.
Covers both digital-silence gaps and a real noise floor (where equality
requires the incremental RMS to be bit-exact with the offline cumsum
envelope), plus the bounded-memory guarantee for live streams.
"""
import numpy as np
import pytest

from tests.test_inference import TINY_MODEL_CONFIG, synth


@pytest.fixture(scope="module")
def engine():
    import jax
    import jax.numpy as jnp

    from some_tpu.inference.me_infer import MIDIExtractionInference
    from some_tpu.nn.model import build_midi_extractor

    config = dict(TINY_MODEL_CONFIG, transfer_dtype="float32")
    model = build_midi_extractor(config)
    variables = model.init(jax.random.PRNGKey(7),
                           np.zeros((1, 64, 80), np.float32),
                           mask=np.ones((1, 64), bool))
    return MIDIExtractionInference.from_variables(
        config, variables, dtype=jnp.float32)


def _song(sr):
    return np.concatenate([
        synth(2.0, 440.0, seed=31),
        np.zeros(sr, np.float32),
        synth(1.5, 523.25, seed=32),
        np.zeros(int(0.8 * sr), np.float32),
        synth(1.2, 330.0, seed=33),
    ])


def _offline_midi(engine, wave, sr):
    from some_tpu.inference.pipeline import transcribe_waveform

    return transcribe_waveform(engine, wave, sr, tempo=120).serialize()


@pytest.mark.parametrize("seed", [0, 1])
def test_stream_matches_offline_bytes(engine, seed):
    from some_tpu.inference.streaming import StreamingTranscriber

    sr = engine.config["audio_sample_rate"]
    wave = _song(sr)
    want = _offline_midi(engine, wave, sr)

    st = StreamingTranscriber(engine)
    rng = np.random.default_rng(seed)
    pos, events = 0, []
    while pos < len(wave):
        n = int(rng.integers(500, 40000))
        events += st.feed(wave[pos:pos + n])
        pos += n
    events += st.flush()
    got = st.to_midi(tempo=120).serialize()
    assert got == want
    # the 1 s gap splits (min_length satisfied); the 0.8 s gap does not
    # (clip would be < min_length) -> exactly two phrases, like offline
    assert len(events) == 2
    offsets = [e["offset"] for e in events]
    assert offsets == sorted(offsets)


def test_phrases_emit_before_stream_ends(engine):
    """Latency: a phrase followed by a decisive silence is emitted as soon
    as the scan sees the next loud frame — not at flush."""
    from some_tpu.inference.streaming import StreamingTranscriber

    sr = engine.config["audio_sample_rate"]
    st = StreamingTranscriber(engine)
    early = []
    early += st.feed(synth(6.0, 440.0, seed=40))  # > min_length (5 s)
    early += st.feed(np.zeros(2 * sr, np.float32))
    early += st.feed(synth(1.0, 392.0, seed=41))
    assert len(early) >= 1, "first phrase should be emitted mid-stream"
    rest = st.flush()
    assert len(rest) >= 1
    # feeding after flush is an error
    with pytest.raises(RuntimeError):
        st.feed(np.zeros(10, np.float32))


class _StubEngine:
    """Engine double for host-plane-only streaming tests."""
    config = {"audio_sample_rate": 44100}

    def infer(self, waveforms):
        return [{"note_midi": np.zeros(0), "note_dur": np.zeros(0),
                 "note_rest": np.zeros(0, bool)} for _ in waveforms]


def _noisy_song(sr, seed=60):
    """Audio with a real noise floor: gaps are -50 dB noise (below the
    -40 dB threshold but NOT digital zero), tones carry the same floor.
    Near-threshold RMS values make silence tags sensitive to low-order
    envelope bits — the case that catches a non-bit-exact incremental RMS."""
    rng = np.random.default_rng(seed)
    parts = [synth(6.0, 440.0, seed=61),
             np.zeros(int(1.5 * sr), np.float32),
             synth(2.0, 523.25, seed=62),
             np.zeros(sr, np.float32),
             synth(1.5, 330.0, seed=63)]
    wave = np.concatenate(parts)
    wave += (10 ** (-50 / 20) * rng.standard_normal(len(wave))
             ).astype(np.float32)
    return wave


def test_incremental_rms_bitexact_vs_offline():
    """The stream's envelope must equal audio/slicer.rms_envelope to the
    BIT on noise-floor audio, across ragged feed boundaries: a plain
    per-frame dot product differs in low-order f64 bits from the offline
    cumulative-sum chain and can flip a near-threshold silence decision."""
    from some_tpu.audio.slicer import rms_envelope
    from some_tpu.inference.streaming import StreamingTranscriber

    sr = 44100
    wave = _noisy_song(sr)
    st = StreamingTranscriber(_StubEngine())
    recorded = []

    def spy(levels, _orig=st._scanner.feed):
        recorded.extend(levels)
        return _orig(levels)

    st._scanner.feed = spy
    rng = np.random.default_rng(3)
    pos = 0
    while pos < len(wave):
        n = int(rng.integers(777, 50000))
        st.feed(wave[pos:pos + n])
        pos += n
    st.flush()
    want = rms_envelope(wave, frame_length=st._win, hop_length=st._hop)
    got = np.asarray(recorded)
    assert got.shape == want.shape
    np.testing.assert_array_equal(got, want)


def test_stream_matches_offline_on_noise_floor(engine):
    """End-to-end stream-equals-offline on audio whose silence gaps are a
    real noise floor, not digital zeros (regression for the RMS-twin gap)."""
    from some_tpu.inference.streaming import StreamingTranscriber

    sr = engine.config["audio_sample_rate"]
    wave = _noisy_song(sr)
    want = _offline_midi(engine, wave, sr)
    st = StreamingTranscriber(engine)
    rng = np.random.default_rng(4)
    pos, events = 0, []
    while pos < len(wave):
        n = int(rng.integers(500, 40000))
        events += st.feed(wave[pos:pos + n])
        pos += n
    events += st.flush()
    assert st.to_midi(tempo=120).serialize() == want
    assert len(events) >= 2


def test_stream_memory_is_bounded():
    """A live stream must not retain every sample ever fed: consumed PCM,
    prefix sums, and old scanner RMS frames are reclaimed, so hours of
    audio hold only the current phrase."""
    from some_tpu.inference.streaming import StreamingTranscriber

    sr = 44100
    st = StreamingTranscriber(_StubEngine())
    phrase = np.concatenate([synth(6.0, 440.0, seed=70),
                             np.zeros(2 * sr, np.float32)])
    for _ in range(6):
        for pos in range(0, len(phrase), 44100):
            st.feed(phrase[pos:pos + 44100])
    total = len(st._buf)
    assert total == 6 * len(phrase)
    # live PCM is ~one phrase, not six (amortized memmove slack allowed)
    assert st._buf._n <= len(phrase) + (1 << 16)
    assert st._sq._n <= 2 * st._win + (1 << 16)
    # scanner keeps O(current silence) frames, not the whole stream
    assert len(st._scanner._rms) <= st._scanner.max_sil_kept + (1 << 13)
    st.flush()


def test_flush_only_single_phrase(engine):
    """A stream with no internal silence: everything arrives at flush as a
    single chunk, identical to offline."""
    from some_tpu.inference.streaming import StreamingTranscriber

    sr = engine.config["audio_sample_rate"]
    wave = synth(6.0, 261.63, seed=50)
    want = _offline_midi(engine, wave, sr)
    st = StreamingTranscriber(engine)
    events = st.feed(wave)
    assert events == []
    events = st.flush()
    assert len(events) == 1
    assert st.to_midi(tempo=120).serialize() == want


def test_stream_with_halfrate_wire_matches_its_offline(engine):
    """wire_sr is engine-internal: the streaming transcriber feeds
    native-rate PCM and must produce byte-identical MIDI to the offline
    pipeline run through the same wire_sr engine."""
    import jax.numpy as jnp

    from some_tpu.inference.me_infer import MIDIExtractionInference
    from some_tpu.inference.streaming import StreamingTranscriber

    config = dict(TINY_MODEL_CONFIG, transfer_dtype="float32",
                  wire_sr=22050)
    eng = MIDIExtractionInference.from_variables(
        config, engine.variables, dtype=jnp.float32)
    sr = eng.config["audio_sample_rate"]
    assert sr == 44100  # callers still see the native rate
    wave = _song(sr)
    want = _offline_midi(eng, wave, sr)

    st = StreamingTranscriber(eng)
    rng = np.random.default_rng(2)
    pos = 0
    while pos < len(wave):
        n = int(rng.integers(500, 40000))
        st.feed(wave[pos:pos + n])
        pos += n
    st.flush()
    assert st.to_midi(tempo=120).serialize() == want

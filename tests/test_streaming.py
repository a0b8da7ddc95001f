"""Live streaming transcription equals the offline pipeline.

The stream drives the exact offline silence-scan incrementally
(some_tpu/inference/streaming.py), so chunk boundaries — and the notes —
must be identical to running the whole file through slice+infer at once.
Uses audio with true digital-silence gaps, where the incremental RMS is
exactly the offline envelope.
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

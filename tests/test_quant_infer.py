"""Quantized-model inference engine: argmax decode, rest class, bucketing."""
import numpy as np
import pytest

from tests.test_inference import synth


@pytest.fixture(scope="module")
def quant_engine():
    import jax
    import jax.numpy as jnp

    from some_tpu.inference.me_quant_infer import QuantizedMIDIExtractionInference
    from some_tpu.nn.model import build_midi_extractor

    config = {
        "audio_sample_rate": 44100, "hop_size": 512, "win_size": 2048,
        "fmin": 40, "fmax": 8000, "units_dim": 80, "midi_num_bins": 129,
        "midi_min": 0, "midi_max": 127, "units_encoder": "mel",
        "task_cls": "training.QuantizedMIDIExtractionTask",
        "midi_extractor_args": {
            "lay": 1, "dim": 32, "use_lay_skip": True, "kernel_size": 7,
            "conv_drop": 0.1, "ffn_latent_drop": 0.1, "ffn_out_drop": 0.1,
            "attention_drop": 0.1, "attention_heads": 2,
            "attention_heads_dim": 16},
    }
    model = build_midi_extractor(config, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(1),
                           np.zeros((1, 64, 80), np.float32),
                           mask=np.ones((1, 64), bool))
    return QuantizedMIDIExtractionInference.from_variables(
        config, variables, dtype=jnp.float32)


def test_quant_engine_outputs(quant_engine):
    w = synth(1.5, 330)
    out = quant_engine.infer([w])[0]
    n_frames = len(w) // 512 + 1
    assert out["note_dur"].sum() == pytest.approx(
        n_frames * quant_engine.timestep, rel=1e-6)
    # quantized decode yields integer-valued midi within range
    assert np.allclose(out["note_midi"], np.round(out["note_midi"]))
    assert (out["note_midi"] >= 0).all() and (out["note_midi"] <= 127).all()
    assert out["note_rest"].dtype == bool


def test_quant_registry_routing():
    from some_tpu.inference.me_quant_infer import QuantizedMIDIExtractionInference
    from some_tpu.registry import TASK_INFERENCE_MAPPING, resolve_class

    cls = resolve_class(
        TASK_INFERENCE_MAPPING["training.QuantizedMIDIExtractionTask"])
    assert cls is QuantizedMIDIExtractionInference


def test_quant_bucketed_equals_solo(quant_engine):
    w1, w2 = synth(0.8, 262, seed=4), synth(1.2, 392, seed=5)
    both = quant_engine.infer([w1, w2])
    solo = quant_engine.infer([w2])
    np.testing.assert_array_equal(both[1]["note_midi"], solo[0]["note_midi"])
    np.testing.assert_array_equal(both[1]["note_rest"], solo[0]["note_rest"])

"""Data-parallel serving: bucket batches sharded over a device mesh.

Runs the real inference engine over the 8-device virtual CPU mesh
(conftest) and asserts note-for-note equality with the single-device
engine, including the row-padding path (chunk counts not divisible by the
mesh size). The torch reference has no multi-accelerator inference at all
(SURVEY §2.3) — this is the TPU-first serving extension.
"""
import numpy as np
import pytest

from tests.test_inference import TINY_MODEL_CONFIG, synth


@pytest.fixture(scope="module")
def engines():
    import jax
    import jax.numpy as jnp

    from some_tpu.inference.me_infer import MIDIExtractionInference
    from some_tpu.nn.model import build_midi_extractor
    from some_tpu.parallel.mesh import make_mesh

    config = dict(TINY_MODEL_CONFIG, transfer_dtype="float32")
    model = build_midi_extractor(config)
    variables = model.init(jax.random.PRNGKey(21),
                           np.zeros((1, 64, 80), np.float32),
                           mask=np.ones((1, 64), bool))
    solo = MIDIExtractionInference.from_variables(
        dict(config), variables, dtype=jnp.float32)
    mesh = make_mesh(jax.devices()[:8])
    dp = MIDIExtractionInference.from_variables(
        dict(config), variables, dtype=jnp.float32, mesh=mesh)
    return solo, dp


def test_mesh_inference_matches_single_device(engines):
    solo, dp = engines
    # 3 chunks -> padded to 8 mesh rows; different lengths share a bucket
    wavs = [synth(1.0, 440, seed=1), synth(1.3, 523, seed=2),
            synth(0.8, 330, seed=3)]
    ref = solo.infer(wavs)
    out = dp.infer(wavs)
    for r, o in zip(ref, out):
        np.testing.assert_allclose(o["note_midi"], r["note_midi"], atol=1e-4)
        np.testing.assert_array_equal(o["note_rest"], r["note_rest"])
        np.testing.assert_allclose(o["note_dur"], r["note_dur"], atol=1e-9)


def test_mesh_inference_full_batch(engines):
    """Exactly mesh-size chunks (no padding) also agree."""
    solo, dp = engines
    wavs = [synth(1.0, 300 + 30 * i, seed=i) for i in range(8)]
    ref = solo.infer(wavs)
    out = dp.infer(wavs)
    for r, o in zip(ref, out):
        np.testing.assert_allclose(o["note_midi"], r["note_midi"], atol=1e-4)
        np.testing.assert_array_equal(o["note_rest"], r["note_rest"])

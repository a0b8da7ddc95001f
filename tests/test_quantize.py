"""Int8 serving path: weight quantization exactness, QDense parity, and
engine-level note agreement vs the f32 engine.

The reference has no quantized path; this is the TPU-first superset
(some_tpu/ops/quant.py) gated behind ``quantize: int8``. Off by default —
test_inference.py's strict parity tests cover quant='none' being untouched.
"""
import numpy as np
import pytest

from tests.test_inference import TINY_MODEL_CONFIG, synth


def test_quantize_weight_roundtrip():
    from some_tpu.ops.quant import quantize_weight

    rng = np.random.default_rng(0)
    w = rng.standard_normal((64, 32)).astype(np.float32)
    q, scale = quantize_weight(w)
    assert q.dtype == np.int8 and scale.shape == (32,)
    deq = q.astype(np.float32) * scale[None, :]
    # per-channel symmetric int8: worst-case error is half a quant step
    step = scale[None, :]
    assert np.all(np.abs(deq - w) <= step * 0.5 + 1e-7)
    # exactly representable weights are exact
    w2 = (np.arange(-127, 128, dtype=np.float32) / 127.0)[:, None] * 0.5
    q2, s2 = quantize_weight(w2)
    np.testing.assert_allclose(q2.astype(np.float32) * s2[None, :], w2,
                               atol=1e-7)


def test_dynamic_int8_dense_close_to_f32():
    import jax
    import jax.numpy as jnp

    from some_tpu.ops.quant import dynamic_int8_dense, quantize_weight

    rng = np.random.default_rng(1)
    x = rng.standard_normal((4, 16, 64)).astype(np.float32)
    w = (rng.standard_normal((64, 128)) * 0.05).astype(np.float32)
    wq, sw = quantize_weight(w)
    y_ref = x @ w
    y_q = np.asarray(dynamic_int8_dense(
        jnp.asarray(x), jnp.asarray(wq), jnp.asarray(sw), jnp.float32))
    # int8 x int8 keeps ~1% relative error on random gaussians
    rel = np.abs(y_q - y_ref) / (np.abs(y_ref).mean() + 1e-6)
    assert rel.mean() < 0.02, rel.mean()


def test_quantize_params_scope():
    """Only block-level matmul kernels are quantized; heads, input
    projections, depthwise taps, and norms stay f32."""
    import jax

    from some_tpu.nn.model import build_midi_extractor
    from some_tpu.ops.quant import quantize_params

    model = build_midi_extractor(dict(TINY_MODEL_CONFIG))
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, 32, 80), np.float32),
                           mask=np.ones((1, 32), bool))
    new_params, qscales = quantize_params(
        jax.tree.map(np.asarray, variables["params"]))

    bb = new_params["backbone"]
    assert bb["in_proj_midi"]["kernel"].dtype == np.float32
    assert bb["out_proj"]["kernel"].dtype == np.float32
    assert bb["bound_head"]["kernel"].dtype == np.float32
    blk = bb["layer_0"]["midi_block"]
    assert blk["ffn1"]["fc1"]["kernel"].dtype == np.int8
    assert blk["attn"]["q_proj"]["kernel"].dtype == np.int8
    assert blk["attn"]["kv_proj"]["kernel"].dtype == np.int8
    assert blk["attn"]["out_proj"]["kernel"].dtype == np.int8
    assert blk["conv"]["pw1"]["kernel"].dtype == np.int8
    assert blk["conv"]["dw"]["kernel"].dtype == np.float32  # depthwise taps
    assert bb["layer_0"]["midi_gate"]["kernel"].dtype == np.int8
    qs = qscales["backbone"]["layer_0"]["midi_block"]
    assert qs["ffn1"]["fc1"]["kernel_scale"].shape == (128,)


@pytest.fixture(scope="module")
def engines():
    import jax
    import jax.numpy as jnp

    from some_tpu.inference.me_infer import MIDIExtractionInference
    from some_tpu.nn.model import build_midi_extractor

    config = dict(TINY_MODEL_CONFIG, transfer_dtype="float32")
    model = build_midi_extractor(config)
    variables = model.init(jax.random.PRNGKey(5),
                           np.zeros((1, 64, 80), np.float32),
                           mask=np.ones((1, 64), bool))
    f32 = MIDIExtractionInference.from_variables(
        dict(config), variables, dtype=jnp.float32)
    q8 = MIDIExtractionInference.from_variables(
        dict(config, quantize="int8"), variables, dtype=jnp.float32)
    return f32, q8


def test_int8_engine_probs_close(engines):
    """Model outputs under int8 stay within a few sigmoid-percent of f32."""
    import jax

    f32, q8 = engines
    wav = synth(1.2, freq=440.0, seed=9)
    units = f32.mel(wav[None])
    mask = np.ones(units.shape[:2], bool)
    p_f, b_f = jax.jit(lambda v, u, m: f32.model.apply(
        v, u, f0=None, mask=m, sig=True))(f32.variables, units, mask)
    p_q, b_q = jax.jit(lambda v, u, m: q8.model.apply(
        v, u, f0=None, mask=m, sig=True))(q8.variables, units, mask)
    assert float(np.abs(np.asarray(p_q) - np.asarray(p_f)).mean()) < 0.02
    assert float(np.abs(np.asarray(b_q) - np.asarray(b_f)).mean()) < 0.05


def test_engine_quantizes_despite_dummy_qscales():
    """bench.py path: model built WITH quantize in config, so model.init
    creates a dummy all-ones qscales collection — the engine must still run
    the real load-time quantization (guard checks kernel dtypes, not qscales
    presence)."""
    import jax
    import jax.numpy as jnp

    from some_tpu.inference.me_infer import MIDIExtractionInference
    from some_tpu.nn.model import build_midi_extractor

    config = dict(TINY_MODEL_CONFIG, transfer_dtype="float32",
                  quantize="int8")
    model = build_midi_extractor(config)
    variables = model.init(jax.random.PRNGKey(7),
                           np.zeros((1, 64, 80), np.float32),
                           mask=np.ones((1, 64), bool))
    assert "qscales" in variables  # init created the dummy collection
    engine = MIDIExtractionInference.from_variables(
        dict(config), jax.tree.map(np.asarray, variables), dtype=jnp.float32)
    blk = engine.variables["params"]["backbone"]["layer_0"]["midi_block"]
    assert np.asarray(blk["ffn1"]["fc1"]["kernel"]).dtype == np.int8
    scale = engine.variables["qscales"]["backbone"]["layer_0"]["midi_block"][
        "ffn1"]["fc1"]["kernel_scale"]
    assert not np.allclose(np.asarray(scale), 1.0)  # real scales, not dummy
    # idempotent: re-wrapping already-quantized variables must not re-quantize
    engine2 = MIDIExtractionInference.from_variables(
        dict(config), dict(engine.variables), dtype=jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(engine2.variables["params"]["backbone"]["layer_0"]
                   ["midi_block"]["ffn1"]["fc1"]["kernel"]),
        np.asarray(blk["ffn1"]["fc1"]["kernel"]))


def test_training_graph_never_quantizes():
    """int8 is serving-only: a task built from a config carrying the serving
    key must produce an unquantized (differentiable) training graph."""
    from some_tpu.training.me_task import MIDIExtractionTask
    from tests.test_training import TINY_CONFIG

    config = dict(TINY_CONFIG, quantize="int8")
    task = MIDIExtractionTask(config)
    assert task.model.quant == "none"


def test_int8_engine_notes_agree(engines):
    """End-to-end notes from the int8 engine match f32 at high note-F1."""
    from some_tpu.utils.note_f1 import note_f1
    from tests.test_onnx_export import _notes_to_events

    f32, q8 = engines
    wav = synth(1.5, freq=392.0, seed=11)
    ref = f32.infer([wav])[0]
    pred = q8.infer([wav])[0]
    r = _notes_to_events(ref["note_midi"], ref["note_dur"], ref["note_rest"])
    p = _notes_to_events(pred["note_midi"], pred["note_dur"], pred["note_rest"])
    assert len(r[0]) > 0
    result = note_f1(r, p, onset_tolerance=0.05, pitch_tolerance=0.5)
    assert result.f1 >= 0.85, result

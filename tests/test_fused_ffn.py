"""Fused LN->FFN->residual Pallas kernel: correctness + model integration.

On CPU the kernel runs in interpret mode (the conformer's fuse_ffn dispatch
selects it automatically off-TPU), so these tests exercise the same code
path the TPU compiles.
"""
import numpy as np
import pytest

from tests.test_inference import TINY_MODEL_CONFIG


def test_kernel_matches_reference_math():
    import jax
    import jax.numpy as jnp

    from some_tpu.ops.fused_ffn import fused_ln_ffn_residual

    key = jax.random.PRNGKey(0)
    B, T, D, H = 2, 256, 64, 256
    ks = jax.random.split(key, 7)
    x = jax.random.normal(ks[0], (B, T, D), jnp.float32)
    g = jnp.abs(jax.random.normal(ks[1], (D,), jnp.float32)) + 0.5
    b = jax.random.normal(ks[2], (D,), jnp.float32) * 0.1
    w1 = jax.random.normal(ks[3], (D, H), jnp.float32) * 0.05
    b1 = jax.random.normal(ks[4], (H,), jnp.float32) * 0.1
    w2 = jax.random.normal(ks[5], (H, D), jnp.float32) * 0.05
    b2 = jax.random.normal(ks[6], (D,), jnp.float32) * 0.1

    def ref(x):
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = xf.var(-1, keepdims=True)
        ln = (xf - mu) * jax.lax.rsqrt(var + 1e-5) * g + b
        h = jax.nn.silu(ln @ w1 + b1)
        return (h @ w2 + b2) * 0.5 + xf

    y = fused_ln_ffn_residual(x, g, b, w1, b1, w2, b2, block_n=128,
                              interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref(x)),
                               atol=2e-5, rtol=1e-5)


def test_fused_model_param_tree_and_parity():
    """fuse_ffn=True shares the exact param tree and matches the unfused
    forward to f32 rounding."""
    import jax
    import jax.numpy as jnp
    import jax.tree_util as tu

    from some_tpu.nn.model import build_midi_extractor

    cfg = dict(TINY_MODEL_CONFIG)
    m0 = build_midi_extractor(cfg)
    mf = build_midi_extractor(dict(cfg, fuse_ffn=True))
    v = m0.init(jax.random.PRNGKey(0), np.zeros((1, 64, 80), np.float32),
                mask=np.ones((1, 64), bool))
    vf = mf.init(jax.random.PRNGKey(0), np.zeros((1, 64, 80), np.float32),
                 mask=np.ones((1, 64), bool))
    keys0 = {tu.keystr(k): x.shape for k, x in
             tu.tree_leaves_with_path(v["params"])}
    keysf = {tu.keystr(k): x.shape for k, x in
             tu.tree_leaves_with_path(vf["params"])}
    assert keys0 == keysf

    rng = np.random.default_rng(0)
    u = rng.standard_normal((2, 64, 80)).astype(np.float32)
    mask = np.ones((2, 64), bool)
    p0, b0 = m0.apply(v, u, f0=None, mask=mask, sig=True)
    pf, bf = mf.apply(v, u, f0=None, mask=mask, sig=True)
    np.testing.assert_allclose(np.asarray(pf), np.asarray(p0), atol=5e-6)
    np.testing.assert_allclose(np.asarray(bf), np.asarray(b0), atol=5e-6)


def test_fused_engine_notes_identical():
    """Engine with fuse_ffn produces the same notes as without."""
    import jax
    import jax.numpy as jnp

    from some_tpu.inference.me_infer import MIDIExtractionInference
    from some_tpu.nn.model import build_midi_extractor
    from tests.test_inference import synth

    cfg = dict(TINY_MODEL_CONFIG, transfer_dtype="float32")
    model = build_midi_extractor(cfg)
    v = model.init(jax.random.PRNGKey(3), np.zeros((1, 64, 80), np.float32),
                   mask=np.ones((1, 64), bool))
    e0 = MIDIExtractionInference.from_variables(dict(cfg), v, dtype=jnp.float32)
    ef = MIDIExtractionInference.from_variables(dict(cfg, fuse_ffn=True), v,
                                                dtype=jnp.float32)
    wav = synth(1.2, freq=440.0, seed=2)
    a = e0.infer([wav])[0]
    b = ef.infer([wav])[0]
    assert len(a["note_midi"]) == len(b["note_midi"])
    np.testing.assert_allclose(a["note_midi"], b["note_midi"], atol=1e-3)
    np.testing.assert_array_equal(a["note_rest"], b["note_rest"])

"""HuBERT/ContentVec units encoder parity vs transformers' HubertModel."""
import numpy as np
import pytest

transformers = pytest.importorskip("transformers")

from some_tpu.nn.contentvec import (  # noqa: E402
    HubertEncoder, convert_fairseq_state_dict, convert_transformers_state_dict,
)

CONV = ((16, 10, 5), (16, 3, 2))
DIM, HEADS, FFN, LAYERS, OUT_LAYER = 32, 2, 64, 3, 2
POS_K, POS_G = 16, 4


@pytest.fixture(scope="module")
def hf_model():
    import torch
    from transformers import HubertConfig, HubertModel

    torch.manual_seed(11)
    config = HubertConfig(
        hidden_size=DIM, num_hidden_layers=LAYERS, num_attention_heads=HEADS,
        intermediate_size=FFN, conv_dim=[c[0] for c in CONV],
        conv_kernel=[c[1] for c in CONV], conv_stride=[c[2] for c in CONV],
        num_feat_extract_layers=len(CONV), num_conv_pos_embeddings=POS_K,
        num_conv_pos_embedding_groups=POS_G, feat_extract_norm="group",
        do_stable_layer_norm=False, feat_extract_activation="gelu",
        hidden_act="gelu", layer_norm_eps=1e-5,
        hidden_dropout=0.0, activation_dropout=0.0, attention_dropout=0.0,
        feat_proj_dropout=0.0, layerdrop=0.0,
    )
    return HubertModel(config).eval()


def test_parity_vs_transformers(hf_model, rng):
    import torch

    sd = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
    variables = convert_transformers_state_dict(sd, output_layer=OUT_LAYER,
                                                conv_layers=CONV)
    model = HubertEncoder(output_layer=OUT_LAYER, num_layers=LAYERS,
                          conv_layers=CONV, embed_dim=DIM, heads=HEADS,
                          ffn_dim=FFN, pos_conv_kernel=POS_K, pos_conv_groups=POS_G)
    wave = rng.standard_normal((1, 800)).astype(np.float32)
    with torch.no_grad():
        ref = hf_model(torch.from_numpy(wave),
                       output_hidden_states=True).hidden_states[OUT_LAYER].numpy()
    out = np.asarray(model.apply(variables, wave))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=5e-5, rtol=1e-4)


def test_fairseq_layout_converter(rng):
    """The fairseq-key converter produces a tree accepted by the module
    (shapes validated via a synthetic fairseq-style state dict)."""
    import jax

    fake = {}
    cin = 1
    for i, (cout, k, s) in enumerate(
            ((512, 10, 5), (512, 3, 2), (512, 3, 2), (512, 3, 2),
             (512, 3, 2), (512, 2, 2), (512, 2, 2))):
        fake[f"feature_extractor.conv_layers.{i}.0.weight"] = \
            rng.standard_normal((cout, cin, k)).astype(np.float32)
        cin = cout
    fake["feature_extractor.conv_layers.0.2.weight"] = np.ones(512, np.float32)
    fake["feature_extractor.conv_layers.0.2.bias"] = np.zeros(512, np.float32)
    fake["layer_norm.weight"] = np.ones(512, np.float32)
    fake["layer_norm.bias"] = np.zeros(512, np.float32)
    fake["post_extract_proj.weight"] = rng.standard_normal((768, 512)).astype(np.float32)
    fake["post_extract_proj.bias"] = np.zeros(768, np.float32)
    fake["encoder.pos_conv.0.weight_g"] = np.ones((1, 1, 128), np.float32)
    fake["encoder.pos_conv.0.weight_v"] = rng.standard_normal(
        (768, 48, 128)).astype(np.float32)
    fake["encoder.pos_conv.0.bias"] = np.zeros(768, np.float32)
    fake["encoder.layer_norm.weight"] = np.ones(768, np.float32)
    fake["encoder.layer_norm.bias"] = np.zeros(768, np.float32)
    for i in range(2):
        t = f"encoder.layers.{i}"
        for proj in ("self_attn.q_proj", "self_attn.k_proj",
                     "self_attn.v_proj", "self_attn.out_proj"):
            fake[f"{t}.{proj}.weight"] = rng.standard_normal((768, 768)).astype(np.float32)
            fake[f"{t}.{proj}.bias"] = np.zeros(768, np.float32)
        fake[f"{t}.fc1.weight"] = rng.standard_normal((3072, 768)).astype(np.float32)
        fake[f"{t}.fc1.bias"] = np.zeros(3072, np.float32)
        fake[f"{t}.fc2.weight"] = rng.standard_normal((768, 3072)).astype(np.float32)
        fake[f"{t}.fc2.bias"] = np.zeros(768, np.float32)
        fake[f"{t}.self_attn_layer_norm.weight"] = np.ones(768, np.float32)
        fake[f"{t}.self_attn_layer_norm.bias"] = np.zeros(768, np.float32)
        fake[f"{t}.final_layer_norm.weight"] = np.ones(768, np.float32)
        fake[f"{t}.final_layer_norm.bias"] = np.zeros(768, np.float32)

    variables = convert_fairseq_state_dict(fake, output_layer=2)
    model = HubertEncoder(output_layer=2)
    wave = rng.standard_normal((1, 3200)).astype(np.float32)
    out = jax.eval_shape(lambda: model.apply(variables, wave))
    assert out.shape[-1] == 768


def test_padded_masked_forward_matches_unpadded(rng):
    """Bucketed zero-padding with masked GroupNorm/pos-conv/attention is
    exact on real frames — the shape-bucketing ContentVecEncoder uses never
    changes unit values."""
    import jax
    import jax.numpy as jnp

    from some_tpu.nn.contentvec import conv_frames

    model = HubertEncoder(output_layer=OUT_LAYER, num_layers=LAYERS,
                          conv_layers=CONV, embed_dim=DIM, heads=HEADS,
                          ffn_dim=FFN, pos_conv_kernel=POS_K, pos_conv_groups=POS_G)
    wave = rng.standard_normal((1, 800)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(3), wave)
    ref = np.asarray(model.apply(variables, wave))

    padded = np.zeros((1, 1280), np.float32)
    padded[:, :800] = wave
    n0 = conv_frames(800, upto=1, conv_layers=CONV)
    nf = conv_frames(800, conv_layers=CONV)
    assert ref.shape[1] == nf
    out = np.asarray(model.apply(variables, padded,
                                 jnp.int32(n0), jnp.int32(nf)))
    np.testing.assert_allclose(out[:, :nf], ref, atol=2e-5, rtol=1e-4)


def test_sample_bucket_grid():
    from some_tpu.nn.contentvec import _sample_bucket

    assert _sample_bucket(1) == 16000
    assert _sample_bucket(16000) == 16000
    assert _sample_bucket(16001) == 24000
    b = _sample_bucket(10 * 60 * 16000)  # 10 min stays within 1.5x
    assert b >= 10 * 60 * 16000 and b <= 15 * 60 * 16000

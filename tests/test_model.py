"""Model + checkpoint-converter parity vs the torch oracle.

Round-trips a randomly initialized torch model of the reference architecture
through the SOME-TPU converter and checks the flax forward matches the torch
forward, including the padded-bucket equivalence property that unlocks
static-shape XLA inference.
"""
import numpy as np
import pytest
import torch

from some_tpu.compat.torch_ckpt import convert_backbone_state_dict
from some_tpu.nn.model import MidiExtractor
from tests.torch_oracle import OracleModel

LAY, DIM, INDIM, OUTDIM, HEADS, HEAD_DIM, KS = 2, 64, 16, 32, 2, 32, 7


@pytest.fixture(scope="module")
def torch_model():
    torch.manual_seed(114514)
    model = OracleModel(LAY, DIM, INDIM, OUTDIM, kernel_size=KS,
                        heads=HEADS, dim_head=HEAD_DIM).eval()
    # randomize BN running stats so conversion of them is actually exercised
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm1d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 2.0)
    return model


@pytest.fixture(scope="module")
def flax_setup(torch_model):
    state_np = {k: v.detach().numpy().astype(np.float32)
                for k, v in torch_model.state_dict().items()}
    variables = convert_backbone_state_dict(state_np)
    model = MidiExtractor(lay=LAY, dim=DIM, indim=INDIM, outdim=OUTDIM,
                          kernel_size=KS, attention_heads=HEADS,
                          attention_heads_dim=HEAD_DIM)
    return model, variables


def test_converted_tree_is_complete(flax_setup, rng):
    import jax
    model, variables = flax_setup
    x = rng.standard_normal((1, 8, INDIM)).astype(np.float32)
    init_vars = model.init(jax.random.PRNGKey(0), x)
    ref_paths = {jax.tree_util.keystr(p)
                 for p, _ in jax.tree_util.tree_leaves_with_path(init_vars["params"])}
    got_paths = {jax.tree_util.keystr(p)
                 for p, _ in jax.tree_util.tree_leaves_with_path(variables["params"])}
    assert ref_paths == got_paths
    # shapes agree everywhere
    flat_ref = dict(jax.tree_util.tree_leaves_with_path(init_vars["params"]))
    for p, leaf in jax.tree_util.tree_leaves_with_path(variables["params"]):
        assert flat_ref[p].shape == leaf.shape, jax.tree_util.keystr(p)


def test_single_block_parity_tight(rng):
    """One conformer block matches torch at ~float32 exactness (5e-5).

    The full-stack comparison below uses loose tolerances because random
    residual stacks amplify f32 reduction-order noise exponentially; this
    tight single-block check is what rules out weight-mapping or activation
    bugs."""
    import jax.numpy as jnp
    from some_tpu.nn.conformer import ConformerBlock
    from tests.torch_oracle import OracleBlock

    torch.manual_seed(3)
    block = OracleBlock(DIM, kernel_size=KS, heads=HEADS, dim_head=HEAD_DIM).eval()
    with torch.no_grad():
        for m in block.modules():
            if isinstance(m, torch.nn.BatchNorm1d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 2.0)

    state = {f"model.att1.{k}": v.detach().numpy().astype(np.float32)
             for k, v in block.state_dict().items()}
    # route through the real converter, then pull out the block subtree
    full = convert_backbone_state_dict(state)
    variables = {"params": full["params"]["backbone"]["final_midi"],
                 "batch_stats": full["batch_stats"]["backbone"]["final_midi"]}

    x = rng.standard_normal((1, 19, DIM)).astype(np.float32)
    with torch.no_grad():
        ref = block(torch.from_numpy(x)).numpy()
    fl_block = ConformerBlock(dim=DIM, kernel_size=KS, heads=HEADS,
                              head_dim=HEAD_DIM, dtype=jnp.float32)
    out = np.asarray(fl_block.apply(variables, x))
    np.testing.assert_allclose(out, ref, atol=5e-5, rtol=1e-4)


@pytest.mark.parametrize("sig,softmax", [(False, False), (True, False), (False, True)])
def test_forward_parity(torch_model, flax_setup, rng, sig, softmax):
    model, variables = flax_setup
    B, T = 2, 33
    x = rng.standard_normal((B, T, INDIM)).astype(np.float32)
    mask = np.ones((B, T), dtype=bool)

    with torch.no_grad():
        ref_midi, ref_bound = torch_model(
            torch.from_numpy(x), mask=torch.from_numpy(mask), sig=sig, softmax=softmax)

    midi, bound = model.apply(variables, x, mask=mask, sig=sig, softmax=softmax)
    # random residual stacks amplify f32 reduction-order noise; the tight
    # equivalence proof is test_single_block_parity_tight above
    np.testing.assert_allclose(np.asarray(midi), ref_midi.numpy(), atol=2e-2, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(bound), ref_bound.numpy(), atol=2e-2, rtol=2e-2)


def test_padded_bucket_equivalence(flax_setup, rng):
    """Padding to a bucket with masking must reproduce the unpadded output."""
    model, variables = flax_setup
    T, T_pad = 29, 48
    x = rng.standard_normal((1, T, INDIM)).astype(np.float32)
    mask_full = np.ones((1, T), dtype=bool)

    midi_ref, bound_ref = model.apply(variables, x, mask=mask_full, sig=True)

    x_pad = np.zeros((1, T_pad, INDIM), dtype=np.float32)
    x_pad[:, :T] = x
    mask_pad = np.zeros((1, T_pad), dtype=bool)
    mask_pad[:, :T] = True
    midi_pad, bound_pad = model.apply(variables, x_pad, mask=mask_pad, sig=True)

    np.testing.assert_allclose(np.asarray(midi_pad)[:, :T], np.asarray(midi_ref),
                               atol=2e-2, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(bound_pad)[:, :T], np.asarray(bound_ref),
                               atol=2e-2, rtol=2e-2)


def test_forward_parity_with_padding_vs_torch(torch_model, flax_setup, rng):
    """Bucketed flax output must match torch run on the *unpadded* sequence —
    the property that lets static-shape XLA inference match the reference."""
    model, variables = flax_setup
    T, T_pad = 21, 32
    x = rng.standard_normal((1, T, INDIM)).astype(np.float32)
    with torch.no_grad():
        ref_midi, ref_bound = torch_model(
            torch.from_numpy(x), mask=torch.ones(1, T, dtype=torch.bool), sig=True)

    x_pad = np.zeros((1, T_pad, INDIM), dtype=np.float32)
    x_pad[:, :T] = x
    mask = np.zeros((1, T_pad), dtype=bool)
    mask[:, :T] = True
    midi, bound = model.apply(variables, x_pad, mask=mask, sig=True)
    np.testing.assert_allclose(np.asarray(midi)[:, :T], ref_midi.numpy(),
                               atol=2e-2, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(bound)[:, :T], ref_bound.numpy(),
                               atol=2e-2, rtol=2e-2)

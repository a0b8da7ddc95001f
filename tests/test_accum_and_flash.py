"""Gradient-accumulation semantics + TPU-gated flash attention parity."""
import numpy as np
import pytest

from tests.test_training import TINY_CONFIG, make_item
from some_tpu.data.indexed_dataset import IndexedDatasetWriter, save_lengths


def test_grad_accum_applies_every_k(tmp_path, rng):
    """With accumulate_grad_batches=2, params change only every 2nd micro-step
    and the applied update equals the mean-gradient step."""
    import jax

    from some_tpu.parallel.mesh import make_mesh, shard_batch
    from some_tpu.training.me_task import MIDIExtractionTask

    data_dir = tmp_path / "binary"
    data_dir.mkdir()
    lengths = []
    with IndexedDatasetWriter(data_dir, "train") as writer:
        for _ in range(2):
            item = make_item(rng, 64, 5)
            writer.add_item(item)
            lengths.append(item["length"])
    save_lengths(data_dir, "train", lengths)

    config = dict(TINY_CONFIG)
    config["binary_data_dir"] = str(data_dir)
    config["accumulate_grad_batches"] = 2
    task = MIDIExtractionTask(config)
    assert task.grad_accum == 2

    mesh = make_mesh(jax.devices()[:1])
    step = task.make_train_step(mesh)
    from some_tpu.data.indexed_dataset import IndexedDataset
    ds = IndexedDataset(data_dir, "train")
    batch = shard_batch(task.collate([ds[0], ds[1]]), mesh)
    state = task.init_state(example_batch=task.collate([ds[0], ds[1]]))

    p0 = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    state, _ = step(state, batch)
    p1 = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    np.testing.assert_array_equal(p1, p0)  # first micro-step: no update yet
    state, _ = step(state, batch)
    p2 = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    assert np.abs(p2 - p0).max() > 0  # second micro-step applies the update
    assert int(state.step) == 2


def test_flash_attention_matches_xla_on_tpu(rng):
    import jax

    if jax.devices()[0].platform != "tpu":
        pytest.skip("flash attention kernel requires a TPU")
    import jax.numpy as jnp

    from some_tpu.ops.attention import dot_product_attention

    B, T, H, D = 2, 512, 4, 64
    q = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)
    mask = np.ones((B, T), bool)
    mask[1, 300:] = False
    mask = jnp.asarray(mask)

    ref = np.asarray(dot_product_attention(q, k, v, mask=mask, impl="xla"))
    out = np.asarray(dot_product_attention(q, k, v, mask=mask, impl="flash"))
    # compare only real rows (padded queries differ by design)
    np.testing.assert_allclose(out[0], ref[0], atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(out[1, :300], ref[1, :300], atol=2e-3, rtol=2e-3)

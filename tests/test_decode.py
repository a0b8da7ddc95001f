"""Decoder parity vs torch oracles re-expressing the reference decode fns
(reference: utils/infer_utils.py:9-76), plus the golden fixture from the
commented doctest (utils/infer_utils.py:103-113)."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from some_tpu.ops.decode import (
    decode_bounds_to_alignment,
    decode_gaussian_blurred_probs,
    decode_note_sequence,
)


# ---- torch oracles (independent re-derivations of the reference logic) ----

def oracle_gaussian_probs(probs, vmin, vmax, deviation, threshold):
    probs = torch.from_numpy(probs)
    num_bins = probs.shape[-1]
    interval = (vmax - vmin) / (num_bins - 1)
    width = int(3 * deviation / interval)
    idx = torch.arange(num_bins)[None, None, :]
    idx_values = idx * interval + vmin
    center = torch.argmax(probs, dim=-1, keepdim=True)
    start = torch.clip(center - width, min=0)
    end = torch.clip(center + width + 1, max=num_bins)
    mask = (idx >= start) & (idx < end)
    w = probs * mask
    ps = torch.sum(w * idx_values, dim=2)
    ws = torch.sum(w, dim=2)
    values = ps / (ws + (ws == 0))
    rest = probs.max(dim=-1)[0] < threshold
    return values.numpy(), rest.numpy()


def oracle_bounds_alignment(bounds, use_diff=True):
    bounds = torch.from_numpy(bounds)
    step = bounds.cumsum(dim=1).round().long()
    if use_diff:
        inc = torch.diff(step, dim=1, prepend=torch.full(
            (bounds.shape[0], 1), -1, dtype=step.dtype)) > 0
    else:
        inc = F.pad(step[:, 1:] > step[:, :-1], [1, 0], value=True)
    return inc.long().cumsum(dim=1).numpy()


def oracle_note_sequence(frame2item, values, masks, threshold=0.5):
    frame2item = torch.from_numpy(frame2item)
    values = torch.from_numpy(values)
    masks = torch.from_numpy(masks)
    b = frame2item.shape[0]
    space = frame2item.max() + 1
    item_dur = frame2item.new_zeros(b, space).scatter_add(
        1, frame2item, torch.ones_like(frame2item))[:, 1:]
    item_unmasked = frame2item.new_zeros(b, space).scatter_add(
        1, frame2item, masks.long())[:, 1:]
    item_masks = item_unmasked / item_dur >= threshold
    vq = values.round().long()
    hist = frame2item.new_zeros(b, space * 128).scatter_add(
        1, frame2item * 128 + vq, torch.ones_like(frame2item) * masks
    ).unflatten(1, [space, 128])[:, 1:, :]
    center = hist.float().argmax(dim=2).to(values.dtype)
    values_center = torch.gather(F.pad(center, [1, 0]), 1, frame2item)
    near = masks & (values >= values_center - 0.5) & (values <= values_center + 0.5)
    valid_dur = frame2item.new_zeros(b, space).scatter_add(
        1, frame2item, near.long())[:, 1:]
    item_values = values.new_zeros(b, space).scatter_add(
        1, frame2item, values * near)[:, 1:] / (valid_dur + (valid_dur == 0))
    return item_values.numpy(), item_dur.numpy(), item_masks.numpy()


# ---- tests ----

def test_gaussian_probs_parity(rng):
    probs = rng.random((2, 37, 128), dtype=np.float32)
    vals, rest = decode_gaussian_blurred_probs(probs, 0, 127, 1.0, 0.1)
    ref_vals, ref_rest = oracle_gaussian_probs(probs, 0, 127, 1.0, 0.1)
    np.testing.assert_allclose(np.asarray(vals), ref_vals, atol=1e-4, rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(rest), ref_rest)


def test_gaussian_probs_rest_detection():
    probs = np.zeros((1, 4, 128), dtype=np.float32)
    probs[0, 0, 60] = 0.9   # voiced
    probs[0, 1, 60] = 0.05  # below threshold -> rest
    vals, rest = decode_gaussian_blurred_probs(probs, 0, 127, 1.0, 0.1)
    assert not np.asarray(rest)[0, 0]
    assert np.asarray(rest)[0, 1]
    assert np.asarray(vals)[0, 0] == pytest.approx(60.0, abs=1e-4)


@pytest.mark.parametrize("use_diff", [True, False])
def test_bounds_alignment_parity(rng, use_diff):
    bounds = (rng.random((3, 50)) < 0.2).astype(np.float32) * rng.random((3, 50)).astype(np.float32)
    ours = np.asarray(decode_bounds_to_alignment(bounds, use_diff=use_diff))
    ref = oracle_bounds_alignment(bounds, use_diff=use_diff)
    np.testing.assert_array_equal(ours, ref)


def test_bounds_alignment_probabilistic(rng):
    # soft boundary probabilities accumulate across frames
    bounds = np.full((1, 10), 0.3, dtype=np.float32)
    ours = np.asarray(decode_bounds_to_alignment(bounds))
    ref = oracle_bounds_alignment(bounds)
    np.testing.assert_array_equal(ours, ref)


def test_note_sequence_golden_fixture():
    """Golden vectors from the reference's commented doctest
    (reference: utils/infer_utils.py:103-113)."""
    frame2item = np.array([
        [1, 1, 1, 1, 2, 2, 3, 3, 3, 0, 0, 0, 0, 0],
        [1, 1, 1, 2, 3, 3, 3, 3, 3, 4, 4, 0, 0, 0],
    ], dtype=np.int64)
    values = np.array([
        [60, 61, 60.5, 63, 57, 57, 50, 55, 54, 0, 0, 0, 0, 0],
        [50, 51, 50.5, 53, 47, 47, 40, 45, 44, 38, 38, 0, 0, 0],
    ], dtype=np.float32)
    masks = frame2item > 0

    ref_vals, ref_dur, ref_masks = oracle_note_sequence(frame2item, values, masks)
    vals, dur, item_masks = decode_note_sequence(frame2item, values, masks)
    n = int(frame2item.max())
    np.testing.assert_allclose(np.asarray(vals)[:, :n], ref_vals[:, :n], atol=1e-5)
    np.testing.assert_array_equal(np.asarray(dur)[:, :n], ref_dur[:, :n])
    np.testing.assert_array_equal(np.asarray(item_masks)[:, :n], ref_masks[:, :n])


def test_note_sequence_random_parity(rng):
    T = 64
    bounds = (rng.random((2, T)) < 0.15).astype(np.float32)
    frame2item = oracle_bounds_alignment(bounds).astype(np.int64)
    values = (rng.random((2, T), dtype=np.float32) * 80 + 30)
    masks = rng.random((2, T)) < 0.8
    ref_vals, ref_dur, ref_masks = oracle_note_sequence(frame2item, values, masks)
    vals, dur, item_masks = decode_note_sequence(frame2item, values, masks)
    n = int(frame2item.max())
    np.testing.assert_allclose(np.asarray(vals)[:, :n], ref_vals[:, :n],
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(dur)[:, :n], ref_dur[:, :n])
    np.testing.assert_array_equal(np.asarray(item_masks)[:, :n], ref_masks[:, :n])


def test_full_decode_chain(rng):
    """bounds + probs -> notes end-to-end matches the oracle chain."""
    B, T = 1, 100
    probs = rng.random((B, T, 128), dtype=np.float32)
    bounds = (rng.random((B, T)) < 0.1).astype(np.float32)
    masks = np.ones((B, T), dtype=bool)

    f2i = np.asarray(decode_bounds_to_alignment(bounds)) * masks
    vals, rest = decode_gaussian_blurred_probs(probs, 0, 127, 1.0, 0.1)
    nv, nd, nm = decode_note_sequence(f2i, np.asarray(vals), ~np.asarray(rest) & masks)

    rf2i = oracle_bounds_alignment(bounds) * masks
    rvals, rrest = oracle_gaussian_probs(probs, 0, 127, 1.0, 0.1)
    rv, rd, rm = oracle_note_sequence(rf2i.astype(np.int64), rvals, ~rrest & masks)
    n = int(rf2i.max())
    np.testing.assert_allclose(np.asarray(nv)[:, :n], rv[:, :n], atol=1e-4, rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(nd)[:, :n], rd[:, :n])
    np.testing.assert_array_equal(np.asarray(nm)[:, :n], rm[:, :n])

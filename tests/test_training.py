"""End-to-end training smoke: synthetic binarized dataset -> Trainer.fit ->
checkpoint -> resume. Exercises sampler determinism, bucket collation, the
mesh train step, loss plumbing, checkpoint retention, and auto-resume."""
import pathlib

import numpy as np
import pytest

from some_tpu.data.indexed_dataset import IndexedDataset, IndexedDatasetWriter, save_lengths

TINY_CONFIG = {
    "audio_sample_rate": 44100, "hop_size": 512, "win_size": 2048,
    "fmin": 40, "fmax": 8000, "units_dim": 16, "midi_num_bins": 128,
    "midi_min": 0, "midi_max": 127, "midi_prob_deviation": 1.0,
    "rest_threshold": 0.1, "seed": 114514,
    "use_midi_loss": True, "use_bound_loss": True,
    "optimizer_args": {"optimizer_cls": "torch.optim.AdamW", "lr": 1e-3,
                       "beta1": 0.9, "beta2": 0.98, "weight_decay": 0},
    "lr_scheduler_args": {"scheduler_cls": "lr_scheduler.scheduler.WarmupLR",
                          "warmup_steps": 10, "min_lr": 1e-5},
    "clip_grad_norm": 1,
    "midi_extractor_args": {
        "lay": 1, "dim": 32, "use_lay_skip": True, "kernel_size": 7,
        "conv_drop": 0.1, "ffn_latent_drop": 0.1, "ffn_out_drop": 0.1,
        "attention_drop": 0.1, "attention_heads": 2, "attention_heads_dim": 16,
    },
    "max_batch_frames": 2000, "max_batch_size": 4,
    "max_val_batch_frames": 2000, "max_val_batch_size": 1,
    "num_valid_plots": 0, "log_interval": 1, "num_sanity_val_steps": 0,
    "val_check_interval": 2, "num_ckpt_keep": 2, "max_updates": 100,
    "permanent_ckpt_start": 0, "permanent_ckpt_interval": 0,
    "sampler_frame_count_grid": 6, "accumulate_grad_batches": 1,
    "sort_by_len": True, "frame_bucket_grid": 32,
    "train_set_name": "train", "valid_set_name": "valid",
}


def make_item(rng, n_frames, n_notes, units_dim=16, quant=False):
    note_dur = rng.multinomial(
        n_frames - n_notes, np.ones(n_notes) / n_notes) + 1
    unit2note = np.repeat(np.arange(1, n_notes + 1), note_dur)
    if quant:
        note_midi = rng.integers(40, 80, n_notes).astype(np.int64)
        rest = rng.random(n_notes) < 0.2
        note_midi[rest] = 128
        extra = {"note_midi": note_midi}
    else:
        extra = {
            "note_midi": rng.uniform(40, 80, n_notes).astype(np.float32),
            "note_rest": (rng.random(n_notes) < 0.2),
        }
    return {
        "units": rng.standard_normal((n_frames, units_dim)).astype(np.float32),
        "pitch": rng.uniform(40, 80, n_frames).astype(np.float32),
        "note_dur": note_dur.astype(np.int64),
        "unit2note": unit2note.astype(np.int64),
        "length": n_frames,
        "seconds": n_frames * 512 / 44100,
        **extra,
    }


@pytest.fixture
def tiny_dataset(tmp_path, rng):
    data_dir = tmp_path / "binary"
    data_dir.mkdir()
    for prefix, n_items in [("train", 6), ("valid", 2)]:
        lengths = []
        with IndexedDatasetWriter(data_dir, prefix) as writer:
            for _ in range(n_items):
                item = make_item(rng, int(rng.integers(40, 120)), int(rng.integers(3, 8)))
                writer.add_item(item)
                lengths.append(item["length"])
        save_lengths(data_dir, prefix, lengths)
    return data_dir


def test_trainer_fit_and_resume(tiny_dataset, tmp_path):
    from some_tpu.parallel.mesh import make_mesh
    from some_tpu.training.me_task import MIDIExtractionTask
    from some_tpu.training.trainer import Trainer
    from some_tpu.training.checkpoint import list_checkpoints
    import jax

    config = dict(TINY_CONFIG)
    config["binary_data_dir"] = str(tiny_dataset)
    work_dir = tmp_path / "work"

    mesh = make_mesh(jax.devices()[:2])
    task = MIDIExtractionTask(config)
    trainer = Trainer(task, work_dir, mesh=mesh)
    state = trainer.fit(max_steps=3)
    assert int(state.step) == 3
    ckpts = list_checkpoints(work_dir)
    assert len(ckpts) >= 1 and ckpts[-1][0] == 3

    # resume: a fresh trainer picks up step 3 and continues to 5
    task2 = MIDIExtractionTask(dict(config))
    trainer2 = Trainer(task2, work_dir, mesh=mesh)
    state2 = trainer2.fit(max_steps=5)
    assert int(state2.step) == 5
    steps = [s for s, _ in list_checkpoints(work_dir)]
    assert 5 in steps
    # retention: num_ckpt_keep=2
    assert len(steps) <= 2


def test_resume_replays_uninterrupted_data_order(tiny_dataset, tmp_path):
    """Interrupt at step 3, resume, train to 8: the train-item access
    sequence equals an uninterrupted 8-step run (fit-loop epoch + batch
    position persist in checkpoint meta; reference counterpart: Lightning
    loop state, utils/training_utils.py:206-211).

    ds_workers=0: this test asserts on dataset-READ order, which the
    prefetch thread intentionally runs ahead of the step loop; the
    STEP-order equivalence of the prefetched path is proven by
    test_prefetch_loader_matches_synchronous (bit-identical params)."""
    from some_tpu.parallel.mesh import make_mesh
    from some_tpu.training.me_task import MIDIExtractionTask
    from some_tpu.training.trainer import Trainer
    import jax

    config = dict(TINY_CONFIG, ds_workers=0)
    config["binary_data_dir"] = str(tiny_dataset)
    mesh = make_mesh(jax.devices()[:1])

    class RecordingTask(MIDIExtractionTask):
        def __init__(self, cfg, record):
            super().__init__(cfg)
            self._record = record

        def load_datasets(self):
            (tds, tsz), valid = super().load_datasets()
            record = self._record

            class _Wrap:
                def __getitem__(self, i):
                    record.append(int(i))
                    return tds[i]

            return (_Wrap(), tsz), valid

    seq_a: list = []
    Trainer(RecordingTask(dict(config), seq_a), tmp_path / "a", mesh=mesh) \
        .fit(max_steps=8)

    seq_b: list = []
    Trainer(RecordingTask(dict(config), seq_b), tmp_path / "b", mesh=mesh) \
        .fit(max_steps=3)
    Trainer(RecordingTask(dict(config), seq_b), tmp_path / "b", mesh=mesh) \
        .fit(max_steps=8)
    assert seq_b == seq_a


def test_train_step_loss_decreases(tiny_dataset):
    """Overfit one batch for a few steps; total loss must go down."""
    from some_tpu.parallel.mesh import make_mesh, shard_batch
    from some_tpu.training.me_task import MIDIExtractionTask
    import jax

    config = dict(TINY_CONFIG)
    config["binary_data_dir"] = str(tiny_dataset)
    task = MIDIExtractionTask(config)
    mesh = make_mesh(jax.devices()[:1])
    train_step = task.make_train_step(mesh)

    ds = IndexedDataset(tiny_dataset, "train")
    batch = task.collate([ds[0], ds[1]])
    device_batch = shard_batch(batch, mesh)
    state = task.init_state(example_batch=batch)
    losses = []
    for _ in range(8):
        state, logs = train_step(state, device_batch)
        losses.append(float(logs["total_loss"]))
    assert losses[-1] < losses[0], losses


def test_quant_task_step(tmp_path, rng):
    from some_tpu.parallel.mesh import make_mesh, shard_batch
    from some_tpu.training.me_quant_task import QuantizedMIDIExtractionTask
    import jax

    data_dir = tmp_path / "binary"
    data_dir.mkdir()
    for prefix, n_items in [("train", 4), ("valid", 1)]:
        lengths = []
        with IndexedDatasetWriter(data_dir, prefix) as writer:
            for _ in range(n_items):
                item = make_item(rng, 64, 5, quant=True)
                writer.add_item(item)
                lengths.append(item["length"])
        save_lengths(data_dir, prefix, lengths)

    config = dict(TINY_CONFIG)
    config["binary_data_dir"] = str(data_dir)
    config["midi_num_bins"] = 129
    task = QuantizedMIDIExtractionTask(config)
    mesh = make_mesh(jax.devices()[:1])
    train_step = task.make_train_step(mesh)
    ds = IndexedDataset(data_dir, "train")
    batch = task.collate([ds[0], ds[1]])
    state = task.init_state(example_batch=batch)
    state, logs = train_step(state, shard_batch(batch, mesh))
    assert np.isfinite(float(logs["total_loss"]))
    assert int(state.step) == 1

    # valid step with metric counters
    valid_step = task.make_valid_step(mesh)
    losses, extras = valid_step(state, shard_batch(batch, mesh))
    assert "midi_acc_correct" in extras
    assert int(extras["midi_acc_total"]) > 0


def test_sampler_determinism_and_partition(rng):
    from some_tpu.data.sampler import BucketBatchSampler

    sizes = rng.integers(50, 500, 64)
    samplers = [BucketBatchSampler(sizes, max_batch_frames=2000, max_batch_size=8,
                                   num_replicas=4, rank=r, seed=7)
                for r in range(4)]
    for s in samplers:
        s.set_epoch(3)
    batches = [s.form_batches() for s in samplers]
    # determinism
    again = samplers[0].form_batches()
    assert batches[0] == again
    # all ranks get equal batch counts
    counts = {len(b) for b in batches}
    assert len(counts) == 1
    # frame budget respected (padded cost)
    for rank_batches in batches:
        for b in rank_batches:
            assert len(b) * max(sizes[i] for i in b) <= 2000 or len(b) == 1


def test_lsgdr_family_matches_reference_formulas():
    """LSGDRLR/V2/V3 curves vs an independent pure-python oracle of the
    reference math (lr_scheduler/scheduler.py:132-305), and registry aliases
    resolve the reference class paths."""
    import math

    from some_tpu.registry import resolve_class
    from some_tpu.training.extra_schedules import LSGDRLR, V2LSGDRLR, V3LSGDRLR

    for ref_path, cls in [("lr_scheduler.scheduler.LSGDRLR", LSGDRLR),
                          ("lr_scheduler.scheduler.V2LSGDRLR", V2LSGDRLR),
                          ("lr_scheduler.scheduler.V3LSGDRLR", V3LSGDRLR)]:
        assert resolve_class(ref_path) is cls

    def oracle_l(step):  # scheduler.py:171-174 (step_num = last_epoch+1)
        s = step + 1
        return 0.0 * 0.9999 ** s + math.cos(math.pi * s / 1500)

    def oracle_v2(step):  # scheduler.py:228-243 ctxadjust_lr defaults
        s = step + 1
        t0, emin, emax, tmctx, ws = 15000, 1e-7, 6e-5, 0.99, 8000
        t_cur = (s + ws) % t0
        t_curx = (s + ws) // t0
        lr = emin + 0.5 * (emax * tmctx ** t_curx - emin * tmctx ** t_curx) * (
            1 + math.cos(math.pi * t_cur / t0))
        return s * (emax / ws) if ws > s else lr

    def oracle_v3(step):  # scheduler.py:276-285 ctxadjust_lr defaults
        s = step + 1
        t0, emin, emax, tmctx, ws = 15000, 6e-5, 9e-5, 0.98, 5000
        t_cur = (s + ws) % t0
        t_curx = (s + ws) // t0
        lr = emin * tmctx ** t_curx + 0.5 * (
            emax * tmctx ** t_curx - emin * tmctx ** t_curx) * (
            1 + math.cos(math.pi * t_cur / t0))
        return s * (emax / ws) if ws > s else lr

    steps = [0, 1, 499, 4999, 7998, 7999, 8000, 14999, 15000, 22499, 60000]
    for sched, oracle in [(LSGDRLR(lr=1e-4), oracle_l),
                          (V2LSGDRLR(lr=1e-4), oracle_v2),
                          (V3LSGDRLR(lr=1e-4), oracle_v3)]:
        for step in steps:
            got, want = float(sched(step)), oracle(step)
            assert got == pytest.approx(want, rel=2e-5, abs=1e-10), \
                (type(sched).__name__, step, got, want)


def test_binarizer_keyshift_is_seeded(monkeypatch, tmp_path):
    """Augmentation shifts are deterministic per (seed, item): repeated
    process_item calls yield identical shifts regardless of global RNG state."""
    import random as _random

    import some_tpu.preprocessing.me_binarizer as mb

    class _Probe(mb.MIDIExtractionBinarizer):
        def __init__(self):  # skip full config plumbing
            self.config = {"seed": 7, "units_encoder": "mel",
                           "audio_sample_rate": 16000}
            self.key_shift_factor = 3
            self.key_shift_min, self.key_shift_max = -5.0, 5.0
            self.round_midi = False

        def compute_units(self, waveform, keyshift=0):
            return np.full((4, 2), keyshift, np.float32)

        def _process_item(self, waveform, meta_data, int_midi=False, item_name=None):
            return {"units": np.zeros((4, 2), np.float32),
                    "pitch": np.zeros(4, np.float32),
                    "note_midi": np.zeros(2, np.float32)}

    monkeypatch.setattr(mb, "load_wav",
                        lambda fn, sr, mono: (np.zeros(16000, np.float32), sr))
    probe = _Probe()
    _random.seed(0)
    run1 = probe.process_item("item_x", {"wav_fn": "x.wav"}, allow_aug=True)
    _random.seed(12345)  # global RNG state must not matter
    run2 = probe.process_item("item_x", {"wav_fn": "x.wav"}, allow_aug=True)
    shifts1 = [float(i["units"][0, 0]) for i in run1[1:]]
    shifts2 = [float(i["units"][0, 0]) for i in run2[1:]]
    assert len(shifts1) == 3 and shifts1 == shifts2
    # a different item draws different shifts
    run3 = probe.process_item("item_y", {"wav_fn": "y.wav"}, allow_aug=True)
    assert [float(i["units"][0, 0]) for i in run3[1:]] != shifts1


def test_losses_invariant_to_bucket_padding(rng):
    """With loss_exclude_bucket_padding (default), midi/bound losses computed
    on a bucket-padded batch equal the values on the same batch padded only
    to its true max length — i.e. exactly what the torch reference computes
    (me_task.py:72-111). Legacy mode reproduces the diluted round-1 scale."""
    from some_tpu.training.me_task import MIDIExtractionTask

    config = dict(TINY_CONFIG)
    config["binary_data_dir"] = "/nonexistent"  # datasets not touched
    task = MIDIExtractionTask(config)
    task.dp_size = 1

    items = [make_item(rng, n, 5) for n in (37, 52)]
    t_real = 52

    def build(grid):
        from some_tpu.data.collate import collate_nd, pad_to_bucket
        batch = {
            "units": collate_nd([i["units"] for i in items]),
            "pitch": collate_nd([i["pitch"] for i in items]),
            "note_midi": collate_nd([i["note_midi"] for i in items]),
            "note_rest": collate_nd([i["note_rest"] for i in items]),
            "note_dur": collate_nd([i["note_dur"] for i in items]),
            "unit2note": collate_nd([i["unit2note"] for i in items]),
            "note_mask": collate_nd(
                [np.ones(len(i["note_midi"]), dtype=bool) for i in items]),
        }
        return pad_to_bucket(batch, length_grid=grid, min_batch=1,
                             length_keys=("units", "pitch", "unit2note"),
                             note_keys=("note_midi", "note_rest", "note_dur",
                                        "note_mask"))

    padded = build(64)      # T -> 64, B -> 2
    minimal = build(1)      # T stays 52
    assert padded["units"].shape[1] == 64 and minimal["units"].shape[1] == t_real

    K = config["midi_num_bins"]
    logits_pad = rng.standard_normal((2, 64, K)).astype(np.float32)
    bounds_pad = rng.random((2, 64)).astype(np.float32)
    out_pad = (logits_pad, bounds_pad)
    out_min = (logits_pad[:, :t_real], bounds_pad[:, :t_real])

    l_pad = {k: float(v) for k, v in task.compute_losses(out_pad, padded).items()}
    l_min = {k: float(v) for k, v in task.compute_losses(out_min, minimal).items()}
    assert l_pad["midi_loss"] == pytest.approx(l_min["midi_loss"], rel=1e-5)
    assert l_pad["bound_loss"] == pytest.approx(l_min["bound_loss"], rel=1e-5)

    # legacy mode: padding dilutes (loss systematically lower)
    task.loss_exclude_bucket_padding = False
    l_legacy = {k: float(v) for k, v in task.compute_losses(out_pad, padded).items()}
    assert l_legacy["midi_loss"] < l_pad["midi_loss"]


def test_warmup_lr_matches_torch_semantics():
    """WarmupLR values match the reference formula incl. the min_lr floor."""
    from some_tpu.training.schedules import WarmupLR

    sched = WarmupLR(lr=1e-4, warmup_steps=100, min_lr=1e-5)
    # during warmup: linear-ish ramp, no floor
    v1 = float(sched(0))
    assert v1 == pytest.approx(1e-4 * 100 ** 0.5 * 1 * 100 ** -1.5)
    # at peak (step_num == warmup_steps): exactly base lr
    assert float(sched(99)) == pytest.approx(1e-4)
    # long after warmup: floored
    assert float(sched(10_000_000)) == pytest.approx(1e-5)


def test_pad_to_bucket_b_multiple(rng):
    """Validation on a non-power-of-two process count: b_multiple forces the
    padded row count to split evenly (trainer.py multi-host _validate)."""
    from some_tpu.data.collate import collate_nd, pad_to_bucket

    items = [make_item(rng, 40, 4)]
    batch = {
        "units": collate_nd([i["units"] for i in items]),
        "pitch": collate_nd([i["pitch"] for i in items]),
        "unit2note": collate_nd([i["unit2note"] for i in items]),
    }
    out = pad_to_bucket(dict(batch), length_grid=32, note_keys=(),
                        common={"b": 6, "b_multiple": 6})
    # bucket_batch_size(6) = 8, rounded up to a multiple of 6 -> 12
    assert out["units"].shape[0] == 12
    assert out["batch_mask"].sum() == 1
    # without b_multiple the old power-of-two behavior is unchanged
    out2 = pad_to_bucket(dict(batch), length_grid=32, note_keys=(),
                         common={"b": 6})
    assert out2["units"].shape[0] == 8


def test_sigterm_checkpoints_like_interrupt(tiny_dataset, tmp_path):
    """TPU pod preemption (SIGTERM) saves a resumable checkpoint at the
    exact applied step, like Ctrl-C. The handler is installed only for the
    duration of fit()."""
    import os
    import signal

    import jax

    from some_tpu.parallel.mesh import make_mesh
    from some_tpu.training.checkpoint import list_checkpoints, load_any_checkpoint, latest_checkpoint
    from some_tpu.training.me_task import MIDIExtractionTask
    from some_tpu.training.trainer import Trainer

    # ds_workers=0: the kill must land on the MAIN thread's collate so the
    # applied-step count at signal time is deterministic (with prefetch the
    # worker thread collates ahead of the step loop and the SIGTERM would
    # race the dispatch)
    config = dict(TINY_CONFIG, ds_workers=0)
    config["binary_data_dir"] = str(tiny_dataset)
    mesh = make_mesh(jax.devices()[:1])
    work_dir = tmp_path / "work"

    class PreemptedTask(MIDIExtractionTask):
        hits = 0

        def collate(self, items, common=None):
            type(self).hits += 1
            if type(self).hits == 3:  # after 2 applied steps
                os.kill(os.getpid(), signal.SIGTERM)
            return super().collate(items, common=common)

    with pytest.raises(KeyboardInterrupt):
        Trainer(PreemptedTask(dict(config)), work_dir, mesh=mesh) \
            .fit(max_steps=10)
    # handler restored to the pre-fit disposition
    assert signal.getsignal(signal.SIGTERM) == signal.SIG_DFL

    ckpts = list_checkpoints(work_dir)
    assert ckpts, "preemption saved no checkpoint"
    meta = load_any_checkpoint(latest_checkpoint(work_dir)).get("meta", {})
    assert meta["micro_step"] == 2  # only applied steps counted
    assert meta["epoch_batch"] == 2  # in-flight batch 3 not consumed

    # resumes cleanly past the preemption point
    state = Trainer(MIDIExtractionTask(dict(config)), work_dir, mesh=mesh) \
        .fit(max_steps=4)
    assert int(state.step) == 4


def test_binarizer_keyshift_clamped_to_label_range(monkeypatch, tmp_path):
    """Shifts are clamped per item so augmented labels stay inside
    [midi_min, midi_max]: a jitted CE gather clamps out-of-range labels
    SILENTLY, so the binarizer must never produce them (the torch reference
    can overshoot, me_binarizer.py:246)."""
    import some_tpu.preprocessing.me_binarizer as mb
    import some_tpu.preprocessing.me_quant_binarizer as mqb

    monkeypatch.setattr(mb, "load_wav",
                        lambda fn, sr, mono: (np.zeros(16000, np.float32), sr))
    monkeypatch.setattr(mqb, "load_wav",
                        lambda fn, sr, mono: (np.zeros(16000, np.float32), sr))

    class _Probe(mb.MIDIExtractionBinarizer):
        def __init__(self):
            self.config = {"seed": 7, "units_encoder": "mel",
                           "audio_sample_rate": 16000,
                           "midi_min": 0, "midi_max": 127}
            self.key_shift_factor = 20
            self.key_shift_min, self.key_shift_max = -12.0, 12.0
            self.round_midi = False

        def compute_units(self, waveform, keyshift=0):
            return np.full((4, 2), keyshift, np.float32)

        def _process_item(self, waveform, meta_data, int_midi=False, item_name=None):
            return {"units": np.zeros((4, 2), np.float32),
                    "pitch": np.zeros(4, np.float32),
                    "note_midi": np.array([120.0, 125.0], np.float32)}

    items = _Probe().process_item("x", {"wav_fn": "x.wav"}, allow_aug=True)
    for aug in items[1:]:
        assert aug["note_midi"].max() <= 127.0 + 1e-6
        assert aug["note_midi"].min() >= 0.0 - 1e-6

    class _QProbe(mqb.QuantizedMIDIExtractionBinarizer):
        def __init__(self):
            self.config = {"seed": 7, "units_encoder": "mel",
                           "audio_sample_rate": 16000,
                           "midi_min": 0, "midi_max": 127}
            self.key_shift_factor = 20
            self.key_shift_min, self.key_shift_max = -12.0, 12.0
            self.round_midi = True

        def compute_units(self, waveform, keyshift=0):
            return np.full((4, 2), keyshift, np.float32)

        def _process_item(self, waveform, meta_data, int_midi=True, item_name=None):
            return {"units": np.zeros((4, 2), np.float32),
                    "pitch": np.zeros(4, np.float32),
                    "note_midi": np.array([3, 125, 60], np.int64),
                    "note_rest": np.array([False, False, True])}

    items = _QProbe().process_item("x", {"wav_fn": "x.wav"}, allow_aug=True)
    for aug in items[1:]:
        voiced = aug["note_midi"][aug["note_midi"] != 128]
        assert voiced.max() <= 127 and voiced.min() >= 0
        # shift range [3-0 .. 127-125] -> [-3, 2]; with 20 draws both-ish ends hit
    shifts = {int(i["units"][0, 0]) for i in items[1:]}
    assert shifts <= set(range(-3, 3))


def test_param_freezing_zeroes_updates(rng):
    """freezing_enabled + frozen_params: prefix-matched params (with or
    without the reference's 'model.' prefix) receive zero updates while the
    rest train (reference: training/base_task.py:144-163)."""
    import jax

    from some_tpu.parallel.mesh import make_mesh, shard_batch
    from some_tpu.training.me_task import MIDIExtractionTask

    config = dict(TINY_CONFIG, freezing_enabled=True,
                  frozen_params=["model.backbone.in_proj_midi"])
    task = MIDIExtractionTask(config)
    mesh = make_mesh(jax.devices()[:1])
    step = task.make_train_step(mesh, donate=False)

    item = make_item(rng, 48, 4)
    batch = shard_batch(task.collate([item]), mesh)
    state0 = task.place_state(task.init_state())
    frozen0 = np.asarray(state0.params["backbone"]["in_proj_midi"]["kernel"])
    other0 = np.asarray(state0.params["backbone"]["in_proj_bound"]["kernel"])
    state1, _ = step(state0, batch)
    state2, _ = step(state1, batch)
    np.testing.assert_array_equal(
        np.asarray(state2.params["backbone"]["in_proj_midi"]["kernel"]), frozen0)
    assert not np.array_equal(
        np.asarray(state2.params["backbone"]["in_proj_bound"]["kernel"]), other0)


def test_finetune_partial_load(tiny_dataset, tmp_path, rng):
    """finetune_enabled loads a pretrained ckpt into a fresh run with prefix
    blacklist + shape-mismatch filtering (reference: base_task.py:165-213)."""
    import jax

    from some_tpu.parallel.mesh import make_mesh
    from some_tpu.training.checkpoint import save_checkpoint
    from some_tpu.training.me_task import MIDIExtractionTask
    from some_tpu.training.trainer import Trainer

    config = dict(TINY_CONFIG)
    config["binary_data_dir"] = str(tiny_dataset)
    mesh = make_mesh(jax.devices()[:1])

    # pretrained ckpt: a distinctively-valued param tree of the same geometry
    donor = MIDIExtractionTask(dict(config)).init_state(seed=99)
    donor_params = jax.tree.map(lambda x: np.asarray(x) + 0.5, donor.params)
    save_checkpoint(tmp_path, 1234, donor_params, donor.batch_stats)

    ft_config = dict(
        config, finetune_enabled=True,
        finetune_ckpt_path=str(tmp_path / "model_ckpt_steps_1234.ckpt"),
        finetune_ignored_params=["model.backbone.bound_head"],
        finetune_strict_shapes=True)
    trainer = Trainer(MIDIExtractionTask(ft_config), tmp_path / "work", mesh=mesh)
    state = trainer.restore_or_init()
    assert int(state.step) == 0  # finetune start, not a resume
    np.testing.assert_array_equal(
        np.asarray(state.params["backbone"]["in_proj_midi"]["kernel"]),
        np.asarray(donor_params["backbone"]["in_proj_midi"]["kernel"]))
    # blacklisted head kept its fresh init (!= donor values)
    assert not np.array_equal(
        np.asarray(state.params["backbone"]["bound_head"]["kernel"]),
        np.asarray(donor_params["backbone"]["bound_head"]["kernel"]))

    # shape-mismatch filtering: donor trained with a different head count is
    # rejected under strict shapes, skipped (kept fresh) otherwise
    bad = jax.tree.map(np.asarray, donor_params)
    bad["backbone"]["out_proj"]["kernel"] = np.zeros((7, 7), np.float32)
    save_checkpoint(tmp_path / "bad", 1, bad, {})
    bad_cfg = dict(ft_config,
                   finetune_ckpt_path=str(tmp_path / "bad" /
                                          "model_ckpt_steps_1.ckpt"))
    with pytest.raises(ValueError):
        Trainer(MIDIExtractionTask(bad_cfg), tmp_path / "w2",
                mesh=mesh).restore_or_init()
    lax_cfg = dict(bad_cfg, finetune_strict_shapes=False)
    state2 = Trainer(MIDIExtractionTask(lax_cfg), tmp_path / "w3",
                     mesh=mesh).restore_or_init()
    assert state2.params["backbone"]["out_proj"]["kernel"].shape != (7, 7)


def test_lr_config_change_applies_on_resume(tiny_dataset, tmp_path):
    """Changing lr_scheduler_args/optimizer lr on resume takes effect
    retroactively: the optax schedule is a pure function of the step counter,
    giving the reference's simulate_lr_scheduler semantics
    (utils/__init__.py:272-283, base_task.py:418-456) with no replay."""
    import jax

    from some_tpu.parallel.mesh import make_mesh
    from some_tpu.training.me_task import MIDIExtractionTask
    from some_tpu.training.trainer import Trainer

    config = dict(TINY_CONFIG)
    config["binary_data_dir"] = str(tiny_dataset)
    mesh = make_mesh(jax.devices()[:1])
    work = tmp_path / "work"

    Trainer(MIDIExtractionTask(dict(config)), work, mesh=mesh).fit(max_steps=3)

    new_cfg = dict(config)
    new_cfg["optimizer_args"] = dict(config["optimizer_args"], lr=5e-3)
    new_cfg["lr_scheduler_args"] = dict(config["lr_scheduler_args"],
                                        warmup_steps=20)
    task2 = MIDIExtractionTask(new_cfg)
    trainer2 = Trainer(task2, work, mesh=mesh)
    state = trainer2.restore_or_init()
    assert int(state.step) == 3
    # the resumed schedule IS the new config's curve, evaluated at the
    # restored step — not the old curve, not a restart from 0
    from some_tpu.training.schedules import WarmupLR
    expect = WarmupLR(lr=5e-3, warmup_steps=20, min_lr=1e-5)
    assert float(task2.schedule(3)) == pytest.approx(float(expect(3)))
    assert float(task2.schedule(3)) != pytest.approx(
        float(WarmupLR(lr=1e-3, warmup_steps=10, min_lr=1e-5)(3)))


def test_prefetch_loader_matches_synchronous(tiny_dataset, tmp_path):
    """ds_workers>0 (threaded batch prefetch under device compute, the
    reference's DataLoader-worker overlap) must train bit-identically to the
    synchronous path, in the same data order."""
    import jax

    from some_tpu.parallel.mesh import make_mesh
    from some_tpu.training.me_task import MIDIExtractionTask
    from some_tpu.training.trainer import Trainer

    mesh = make_mesh(jax.devices()[:1])

    def run(ds_workers, tag):
        config = dict(TINY_CONFIG, ds_workers=ds_workers)
        config["binary_data_dir"] = str(tiny_dataset)
        trainer = Trainer(MIDIExtractionTask(config), tmp_path / tag, mesh=mesh)
        state = trainer.fit(max_steps=6)
        leaves = jax.tree_util.tree_leaves(jax.tree.map(np.asarray, state.params))
        return np.concatenate([l.ravel() for l in leaves])

    sync = run(0, "sync")
    pre = run(2, "prefetch")
    np.testing.assert_array_equal(sync, pre)


def test_validation_plots_are_produced(tiny_dataset, tmp_path):
    """num_valid_plots>0 logs all four reference figure types per validation
    batch (reference: training/me_task.py:159-196). The trainer swallows
    plotting exceptions to protect training, so without this test a broken
    figure would fail silently."""
    import jax

    from some_tpu.parallel.mesh import make_mesh
    from some_tpu.training.me_task import MIDIExtractionTask
    from some_tpu.training.trainer import Trainer

    class Writer:
        def __init__(self):
            self.scalars = []
            self.figures = []

        def add_scalar(self, tag, value, step):
            self.scalars.append(tag)

        def add_figure(self, tag, figure, step):
            assert figure is not None
            self.figures.append(tag)

    config = dict(TINY_CONFIG, num_valid_plots=1, val_check_interval=2)
    config["binary_data_dir"] = str(tiny_dataset)
    writer = Writer()
    trainer = Trainer(MIDIExtractionTask(config), tmp_path / "w",
                      mesh=make_mesh(jax.devices()[:1]), log_writer=writer)
    trainer.fit(max_steps=2)
    tags = {t.split("/")[0] for t in writer.figures}
    assert tags == {"prob", "boundary", "midi", "final"}, writer.figures
    assert any(t.startswith("validation/") for t in writer.scalars)

"""Full data-plane e2e: raw DiffSinger dataset -> binarize -> train step.

Exercises metadata parsing, label normalization, mel units with key-shift
augmentation, YIN pitch, alignment, the HDF5 store, and that the binarized
output feeds the training task directly.
"""
import csv
import json

import numpy as np
import pytest

SR = 44100


def write_raw_dataset(root, rng, n_items=3):
    wavs = root / "wavs"
    wavs.mkdir(parents=True)
    rows = []
    for i in range(n_items):
        name = f"item{i}"
        # three "notes": A3 rest C4, as a sung-ish sine with vibrato
        note_seq = ["A3", "rest", "C4+20"]
        note_dur = [0.5, 0.3, 0.7]
        note_slur = [0, 0, 0]
        total = sum(note_dur)
        t = np.arange(int(SR * total)) / SR
        freq = np.where(t < 0.5, 220.0, np.where(t < 0.8, 0.0, 261.6 * 2 ** (0.2 / 12)))
        vib = 1 + 0.003 * np.sin(2 * np.pi * 5 * t)
        wave = 0.4 * np.sin(2 * np.pi * np.cumsum(freq * vib) / SR)
        wave *= (freq > 0)
        wave += 0.002 * rng.standard_normal(len(wave))
        from some_tpu.audio.wavio import save_wav
        save_wav(wavs / f"{name}.wav", wave.astype(np.float32), SR)
        ds = [{
            "note_seq": " ".join(note_seq),
            "note_dur": " ".join(str(d) for d in note_dur),
            "note_slur": " ".join(str(s) for s in note_slur),
        }]
        (wavs / f"{name}.ds").write_text(json.dumps(ds))
        rows.append({"name": name, "ph_seq": "a b c", "ph_dur": "0.5 0.3 0.7",
                     "ph_num": "1 1 1"})
    with open(root / "transcriptions.csv", "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=["name", "ph_seq", "ph_dur", "ph_num"])
        writer.writeheader()
        writer.writerows(rows)


@pytest.fixture(scope="module")
def raw_and_binary(tmp_path_factory):
    rng = np.random.default_rng(99)
    root = tmp_path_factory.mktemp("raw")
    binary = tmp_path_factory.mktemp("binary")
    write_raw_dataset(root, rng)

    config = {
        "raw_data_dir": [str(root)], "binary_data_dir": str(binary),
        "binarization_args": {"num_workers": 0, "shuffle": True,
                              "skip_glide": True, "merge_rest": True,
                              "merge_slur": True, "round_midi": False,
                              "slur_tolerance": 0.5},
        "audio_sample_rate": SR, "hop_size": 512, "win_size": 2048,
        "fmin": 40, "fmax": 8000, "units_dim": 80, "units_encoder": "mel",
        "pe": "yin", "pe_ckpt": None,
        "key_shift_factor": 1, "key_shift_range": [-3, 3],
        "test_prefixes": ["item0"], "seed": 114514,
        "midi_min": 0, "midi_max": 127,
    }
    from some_tpu.preprocessing.me_binarizer import MIDIExtractionBinarizer
    MIDIExtractionBinarizer(dict(config)).process()
    return root, binary, config


def test_binarized_outputs(raw_and_binary):
    from some_tpu.data.indexed_dataset import IndexedDataset, load_lengths

    _, binary, _ = raw_and_binary
    train = IndexedDataset(binary, "train")
    valid = IndexedDataset(binary, "valid")
    # 2 train items x (1 + key_shift_factor) aug copies; 1 valid item
    assert len(train) == 4
    assert len(valid) == 1
    lengths = load_lengths(binary, "train")
    assert len(lengths) == 4

    item = train[0]
    n_frames = item["units"].shape[0]
    assert item["units"].shape == (n_frames, 80)
    assert item["pitch"].shape == (n_frames,)
    assert item["unit2note"].shape == (n_frames,)
    assert item["unit2note"].max() == len(item["note_midi"])
    assert item["note_midi"].dtype == np.float32
    assert item["note_rest"].sum() == 1  # single rest note
    # note durations sum to ~total frames (1.5 s / 512 hop)
    assert abs(int(item["note_dur"].sum()) - n_frames) <= 2
    # pitch sanity: voiced A3 region decodes near midi 57
    a3_region = item["pitch"][5:int(0.4 * SR / 512)]
    assert np.median(a3_region) == pytest.approx(57, abs=1.0)

    # augmented copy differs in units but shares alignment
    aug = train[1]
    assert aug["unit2note"].shape == item["unit2note"].shape


def test_aug_shifts_note_midi(raw_and_binary):
    from some_tpu.data.indexed_dataset import IndexedDataset
    _, binary, _ = raw_and_binary
    train = IndexedDataset(binary, "train")
    base, aug = train[0], train[1]
    shift = aug["note_midi"][0] - base["note_midi"][0]
    np.testing.assert_allclose(aug["note_midi"], base["note_midi"] + shift,
                               atol=1e-5)
    np.testing.assert_allclose(aug["pitch"], base["pitch"] + shift, atol=1e-4)


def test_binarized_data_trains(raw_and_binary):
    import jax

    from some_tpu.data.indexed_dataset import IndexedDataset
    from some_tpu.parallel.mesh import make_mesh, shard_batch
    from some_tpu.training.me_task import MIDIExtractionTask

    _, binary, bin_config = raw_and_binary
    config = dict(bin_config)
    config.update({
        "binary_data_dir": str(binary), "midi_num_bins": 128,
        "midi_prob_deviation": 1.0, "rest_threshold": 0.1,
        "use_midi_loss": True, "use_bound_loss": True,
        "optimizer_args": {"optimizer_cls": "torch.optim.AdamW", "lr": 1e-4,
                           "beta1": 0.9, "beta2": 0.98, "weight_decay": 0},
        "lr_scheduler_args": {"scheduler_cls": "lr_scheduler.scheduler.WarmupLR",
                              "warmup_steps": 10, "min_lr": 1e-5},
        "clip_grad_norm": 1, "frame_bucket_grid": 32,
        "midi_extractor_args": {
            "lay": 1, "dim": 32, "use_lay_skip": True, "kernel_size": 7,
            "conv_drop": 0.1, "ffn_latent_drop": 0.1, "ffn_out_drop": 0.1,
            "attention_drop": 0.1, "attention_heads": 2,
            "attention_heads_dim": 16},
    })
    task = MIDIExtractionTask(config)
    mesh = make_mesh(jax.devices()[:1])
    step = task.make_train_step(mesh)
    ds = IndexedDataset(binary, "train")
    batch = task.collate([ds[0], ds[1]])
    state = task.init_state(example_batch=batch)
    state, logs = step(state, shard_batch(batch, mesh))
    assert np.isfinite(float(logs["total_loss"]))


def test_rmvpe_prepare_pass_matches_per_item(tmp_path):
    """The serial-path batched-pitch prepare pass (prepare_items ->
    RMVPE.f0_batch cache) must produce byte-identical pitch to the
    per-item extract_pitch path. A stub RMVPE isolates the plumbing."""
    from some_tpu.nn.rmvpe import RMVPE
    from some_tpu.preprocessing.me_binarizer import MIDIExtractionBinarizer

    class FakeRMVPE:
        def _f0_10ms(self, w, sr):
            n = int(len(w) / sr / 0.01) + 1
            return (220.0 + 5 * np.sin(np.arange(n) * 0.1)).astype(np.float32)

        def f0_batch(self, waves, sr, thred=0.03):
            return [self._f0_10ms(w, sr) for w in waves]

        def get_pitch(self, w, sample_rate, hop_size, length,
                      interp_uv=False):
            return RMVPE.f0_to_grid(self._f0_10ms(w, sample_rate),
                                    sample_rate, hop_size, length,
                                    interp_uv=interp_uv)

    fake_key = "test://fake-rmvpe"
    RMVPE._cache[fake_key] = FakeRMVPE()
    try:
        rng = np.random.default_rng(5)
        root = tmp_path / "raw"
        write_raw_dataset(root, rng, n_items=3)
        config = {
            "raw_data_dir": [str(root)], "binary_data_dir": "",
            "binarization_args": {"num_workers": 0, "shuffle": False,
                                  "skip_glide": True, "merge_rest": True,
                                  "merge_slur": True, "round_midi": False,
                                  "slur_tolerance": 0.5},
            "audio_sample_rate": SR, "hop_size": 512, "win_size": 2048,
            "fmin": 40, "fmax": 8000, "units_dim": 80,
            "units_encoder": "mel", "pe": "rmvpe", "pe_ckpt": fake_key,
            "key_shift_factor": 0, "key_shift_range": [-3, 3],
            "test_prefixes": ["item0"], "seed": 1,
            "midi_min": 0, "midi_max": 127,
        }
        import h5py

        def run(out, prepared):
            cfg = dict(config, binary_data_dir=str(out))
            out.mkdir()
            b = MIDIExtractionBinarizer(dict(cfg))
            if not prepared:
                b.prepare_items = None  # shadow the method -> hook skipped
            b.process()
            pitches = {}
            for prefix in ("train", "valid"):
                with h5py.File(out / f"{prefix}.data", "r") as f:
                    for k in f:
                        if "pitch" in f[k]:
                            pitches[f"{prefix}/{k}"] = f[k]["pitch"][()]
            return pitches

        a = run(tmp_path / "bin_prepared", prepared=True)
        b = run(tmp_path / "bin_per_item", prepared=False)
        assert a.keys() == b.keys() and len(a) >= 3
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])
    finally:
        RMVPE._cache.pop(fake_key, None)

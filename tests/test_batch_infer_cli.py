"""batch_infer e2e: dataset + ckpt -> transcriptions.csv rewrite."""
import csv
import json
import pathlib
import subprocess
import sys

import numpy as np
import pytest
import yaml

REPO = pathlib.Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def dataset_and_ckpt(tmp_path_factory):
    import jax

    sys.path.insert(0, str(REPO / "tools"))
    from smoke_train import SR, synth_song

    from some_tpu.audio.wavio import save_wav
    from some_tpu.nn.model import build_midi_extractor
    from some_tpu.training.checkpoint import save_checkpoint

    root = tmp_path_factory.mktemp("bi_dataset")
    wavs = root / "wavs"
    wavs.mkdir()
    rng = np.random.default_rng(5)
    rows = []
    for i in range(2):
        notes = [60.0, None, 64.0]
        durs = [0.5, 0.3, 0.6]
        save_wav(wavs / f"s{i}.wav", synth_song(rng, notes, durs), SR)
        rows.append({"name": f"s{i}", "ph_seq": "a b c",
                     "ph_dur": "0.5 0.3 0.6", "ph_num": "1 1 1"})
    with open(root / "transcriptions.csv", "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=["name", "ph_seq", "ph_dur", "ph_num"])
        writer.writeheader()
        writer.writerows(rows)

    ckpt_dir = tmp_path_factory.mktemp("bi_ckpt")
    config = {
        "audio_sample_rate": SR, "hop_size": 512, "win_size": 2048,
        "fmin": 40, "fmax": 8000, "units_dim": 80, "midi_num_bins": 128,
        "midi_min": 0, "midi_max": 127, "midi_prob_deviation": 1.0,
        "rest_threshold": 0.1, "units_encoder": "mel",
        "task_cls": "training.MIDIExtractionTask",
        "midi_extractor_args": {
            "lay": 1, "dim": 32, "use_lay_skip": True, "kernel_size": 7,
            "conv_drop": 0.1, "ffn_latent_drop": 0.1, "ffn_out_drop": 0.1,
            "attention_drop": 0.1, "attention_heads": 2,
            "attention_heads_dim": 16},
    }
    model = build_midi_extractor(config)
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, 32, 80), np.float32))
    ckpt = save_checkpoint(ckpt_dir, 10, variables["params"],
                           variables.get("batch_stats"))
    yaml.safe_dump(config, open(ckpt_dir / "config.yaml", "w"))
    return root, ckpt


@pytest.mark.parametrize("round_midi", [False, True])
def test_batch_infer_cli(dataset_and_ckpt, tmp_path, round_midi):
    dataset, ckpt = dataset_and_ckpt
    out_csv = tmp_path / f"out_{round_midi}.csv"
    cmd = [sys.executable, str(REPO / "batch_infer.py"),
           "--dataset", str(dataset), "--model", str(ckpt),
           "--csv", str(out_csv)]
    if round_midi:
        cmd.append("--round_midi")
    env = dict(__import__("os").environ, SOME_TPU_PLATFORM="cpu",
               PYTHONPATH=str(REPO))
    result = subprocess.run(cmd, capture_output=True, text=True, timeout=560,
                            env=env)
    assert result.returncode == 0, result.stderr[-2000:]

    with open(out_csv, newline="") as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 2
    for row in rows:
        seq = row["note_seq"].split()
        durs = [float(d) for d in row["note_dur"].split()]
        assert len(seq) == len(durs) > 0
        # durations still cover the words exactly
        assert sum(durs) == pytest.approx(0.5 + 0.3 + 0.6, abs=1e-4)
        if round_midi:
            # exactly one max-overlap note per word window
            # (labels may still carry cent suffixes — reference behavior:
            # the flag changes note selection, not the calc_seq format)
            assert len(seq) == 3

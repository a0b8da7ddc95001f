"""stream.py CLI e2e: raw PCM on stdin -> live NDJSON note events.

Drives the real subprocess through a pipe, feeding audio incrementally, and
checks (1) the first phrase's event arrives while stdin is still open —
genuinely live, not buffered-to-EOF — and (2) the accumulated MIDI equals
the offline infer.py pipeline on the same audio."""
import json
import os
import pathlib
import select
import subprocess
import sys

import numpy as np
import pytest
import yaml

REPO = pathlib.Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    import jax

    from some_tpu.nn.model import build_midi_extractor
    from some_tpu.training.checkpoint import save_checkpoint

    ckpt_dir = tmp_path_factory.mktemp("stream_ckpt")
    config = {
        "audio_sample_rate": 44100, "hop_size": 512, "win_size": 2048,
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
    path = save_checkpoint(ckpt_dir, 10, variables["params"],
                           variables.get("batch_stats"))
    yaml.safe_dump(config, open(ckpt_dir / "config.yaml", "w"))
    return path, config


def _song(sr):
    from tests.test_inference import synth

    return np.concatenate([
        synth(6.0, 440.0, seed=60),          # > min_length: splits at the gap
        np.zeros(2 * sr, np.float32),
        synth(1.0, 523.25, seed=61),
    ])


def test_stream_cli_live_events_and_midi(ckpt, tmp_path):
    ckpt_path, config = ckpt
    sr = config["audio_sample_rate"]
    wave = _song(sr)
    pcm = (np.clip(wave, -1, 1) * 32767).astype("<i2").tobytes()
    midi_path = tmp_path / "stream.mid"

    env = dict(os.environ, SOME_TPU_PLATFORM="cpu", PYTHONPATH=str(REPO))
    proc = subprocess.Popen(
        [sys.executable, str(REPO / "stream.py"), "--model", str(ckpt_path),
         "--midi", str(midi_path)],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE, env=env)
    try:
        # feed through 0.5 s INTO phrase 2 (the split at the 6..8 s silence
        # is decided at phrase 2's first loud frame), then wait for the
        # first phrase's event while the stream is still open
        split = int(8.5 * sr) * 2
        step = sr // 2  # 250 ms of s16le
        for pos in range(0, split, step):
            proc.stdin.write(pcm[pos:pos + step])
            proc.stdin.flush()
        ready, _, _ = select.select([proc.stdout], [], [], 300)
        assert ready, "no event arrived while the stream was still open"
        first = json.loads(proc.stdout.readline())
        assert first["offset_sec"] == 0.0
        assert len(first["note_midi"]) > 0

        proc.stdin.write(pcm[split:])
        proc.stdin.close()
        rest = [json.loads(line) for line in proc.stdout]
        assert proc.wait(timeout=300) == 0
    finally:
        proc.kill()

    events = [first] + rest
    offsets = [e["offset_sec"] for e in events]
    assert offsets == sorted(offsets) and len(events) == 2

    # MIDI equals the offline CLI pipeline byte-for-byte. Write the wav from
    # the exact int16 samples (save_wav re-encodes floats via *32767, which
    # would shift the PCM by one LSB vs what the stream saw).
    from scipy.io import wavfile

    wav_path = tmp_path / "song.wav"
    wavfile.write(str(wav_path), sr, np.frombuffer(pcm, "<i2"))
    offline_mid = tmp_path / "offline.mid"
    result = subprocess.run(
        [sys.executable, str(REPO / "infer.py"), "--model", str(ckpt_path),
         "--wav", str(wav_path), "--midi", str(offline_mid)],
        capture_output=True, text=True, timeout=560, env=env)
    assert result.returncode == 0, result.stderr[-2000:]
    assert midi_path.read_bytes() == offline_mid.read_bytes()

"""CPU-inference RTF: the reference's OTHER published baseline.

The reference README publishes two inference speeds (reference:
README.md:12): 300x real-time on an RTX 3080 Ti (bench.py measures the TPU
pipeline against that) and **9x real-time on an Intel i5-12400** (6 P-cores).
This tool measures the same full wav-file -> MIDI-file pipeline with the
XLA CPU backend in float32 — the honest apples-to-apples for the CPU row —
so the framework has a measured number for CPU-only deployments too.

Run on a known-core-count host and compare per-core: this dev box exposes
ONE contended core, the i5-12400 has 6 (12 threads).

  SOME_TPU_PLATFORM=cpu python tools/bench_cpu.py [--phrases 4] [--runs 3]

Prints one JSON line with both best-of-N (the headline, comparable to the
reference's best-case figure) and the median (the reproducible number —
on a contended 1-core box two samples make a noisy "best").
"""
from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
os.environ["SOME_TPU_PLATFORM"] = "cpu"  # before any jax import
# persistent compile cache: applied by `import some_tpu` via jax.config.update
# (env vars are DEAD on this image — sitecustomize imports jax first; CLAUDE.md)

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phrases", type=int, default=4,
                    help="synthetic-song length in ~11 s phrases")
    ap.add_argument("--runs", type=int, default=3,
                    help="timed runs; reports best AND median")
    ap.add_argument("--batch_chunks", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import some_tpu  # noqa: F401  (applies the CPU platform pin)
    from __graft_entry__ import _flagship_config
    from bench import _make_song_wav
    from some_tpu.audio.slicer import SilenceSlicer
    from some_tpu.audio.wavio import load_wav
    from some_tpu.inference.me_infer import MIDIExtractionInference
    from some_tpu.nn.model import build_midi_extractor
    from some_tpu.utils.midi_file import build_midi_file

    assert jax.devices()[0].platform == "cpu"
    config = _flagship_config()
    # f32 weights: XLA-CPU has no fast bf16 unit, and the reference's CPU
    # figure is f32 torch — keep the comparison honest
    model = build_midi_extractor(config, dtype=jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0),
        np.zeros((1, 256, config["units_dim"]), np.float32),
        mask=np.ones((1, 256), bool))
    engine = MIDIExtractionInference.from_variables(
        config, variables, dtype=jnp.float32,
        max_batch_chunks=args.batch_chunks)

    tmpdir = pathlib.Path("/tmp/some_tpu_bench_cpu")
    tmpdir.mkdir(exist_ok=True)
    wav_path = tmpdir / "song.wav"
    sr = config["audio_sample_rate"]
    audio_seconds = _make_song_wav(wav_path, sr, n_phrases=args.phrases)
    midi_path = tmpdir / "song.mid"

    def run_once():
        waveform, _ = load_wav(wav_path, sr=sr, mono=True)
        chunks = SilenceSlicer(sr=sr, max_sil_kept=1000).slice(waveform)
        segments = engine.infer([c["waveform"] for c in chunks])
        build_midi_file([c["offset"] for c in chunks], segments,
                        tempo=120).save(midi_path)

    t0 = time.perf_counter()
    run_once()  # warmup compiles every bucket touched
    warm = time.perf_counter() - t0
    times = []
    for _ in range(args.runs):
        t0 = time.perf_counter()
        run_once()
        times.append(time.perf_counter() - t0)
    best = min(times)
    median = float(np.median(times))

    try:
        n_cores = len(os.sched_getaffinity(0))
    except AttributeError:
        n_cores = os.cpu_count() or 1
    print(json.dumps({
        "metric": "cpu_inference_rtf",
        "cpu_file_rtf": round(audio_seconds / best, 2),
        "cpu_file_rtf_median": round(audio_seconds / median, 2),
        "runs": args.runs,
        "audio_seconds": round(audio_seconds, 1),
        "warmup_s": round(warm, 1),
        "n_cores": n_cores,
        "unit": ("audio-sec/sec, full wav->MIDI file pipeline, XLA CPU f32 "
                 "8x512 conformer; reference baseline: 9x on 6-core "
                 "i5-12400 (reference README.md:12)"),
    }), flush=True)


if __name__ == "__main__":
    main()

"""Serving latency: time-to-MIDI for ONE request, p50/p90/p99.

bench.py measures throughput (audio-sec/sec at a full 32-chunk batch);
production serving also cares about the latency of a single song request
riding the same engine — the number serve.py users actually feel. This
times the complete request path (slice -> encode -> transfer -> compute ->
decode fetch -> note assembly -> SMF bytes) for a single ~12 s phrase and
for a full phrase-structured song, repeated N times on a warm engine.

The lazy axon backend forces the usual discipline: each iteration's wall
time ends only after the MIDI bytes exist on the host (note arrays fetched),
so the serial chain is fully executed (CLAUDE.md lazy-backend rule).

  python tools/bench_latency.py [--iters 20] [--phrases 16]

Prints one JSON line with percentiles in milliseconds.
"""
from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/some_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import numpy as np


def _percentiles(samples_ms):
    s = np.sort(np.asarray(samples_ms))
    return {
        "p50_ms": round(float(np.percentile(s, 50)), 1),
        "p90_ms": round(float(np.percentile(s, 90)), 1),
        "p99_ms": round(float(np.percentile(s, 99)), 1),
        "min_ms": round(float(s[0]), 1),
        "max_ms": round(float(s[-1]), 1),
    }


def _request(engine, waveform, sr):
    """One serving request: waveform -> SMF bytes (mirrors serve.py's path)."""
    from some_tpu.audio.slicer import SilenceSlicer
    from some_tpu.utils.midi_file import build_midi_file

    chunks = SilenceSlicer(sr=sr, max_sil_kept=1000).slice(waveform)
    segments = engine.infer([c["waveform"] for c in chunks])
    midi = build_midi_file([c["offset"] for c in chunks], segments, tempo=120)
    return midi.serialize()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--phrases", type=int, default=16,
                    help="phrases in the full-song case (~11.2 s each)")
    args = ap.parse_args()

    from bench import _make_song_wav, build_engine
    from some_tpu.audio.wavio import load_wav

    engine, config = build_engine()
    sr = config["audio_sample_rate"]
    tmpdir = pathlib.Path("/tmp/some_tpu_bench_lat")
    tmpdir.mkdir(exist_ok=True)

    cases = {}
    for name, n_phrases in (("phrase_12s", 1), (f"song_{args.phrases}x11s",
                                                args.phrases)):
        wav = tmpdir / f"{name}.wav"
        audio_seconds = _make_song_wav(wav, sr, n_phrases=n_phrases)
        waveform, _ = load_wav(wav, sr=sr, mono=True)
        _request(engine, waveform, sr)  # warm every bucket this case hits
        samples = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            smf = _request(engine, waveform, sr)
            samples.append((time.perf_counter() - t0) * 1e3)
            assert len(smf) > 20
        cases[name] = dict(_percentiles(samples),
                           audio_seconds=round(audio_seconds, 1),
                           rtf_at_p50=round(
                               audio_seconds * 1e3 / np.percentile(
                                   np.sort(samples), 50), 1))

    print(json.dumps({
        "metric": "serving_latency_ms",
        "iters": args.iters,
        "unit": ("wall ms per request: slice -> wire encode -> transfer -> "
                 "jitted pipeline -> note fetch -> SMF bytes, warm engine, "
                 "1 chip"),
        **cases,
    }), flush=True)


if __name__ == "__main__":
    main()

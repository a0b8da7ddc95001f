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

  python tools/bench_latency.py [--iters 100] [--phrases 16]

Prints one JSON line with percentiles in milliseconds. The hang-prone
tunnel is handled like bench.py: a watchdog emits a timeout-sentinel JSON
line and hard-exits after SOME_BENCH_TIMEOUT seconds (default 1800), so a
dead device can never hang the tool silently. p99 is only reported when
the sample count supports it (>=50 iters); below that the max stands in.
"""
from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
# persistent compile cache: applied by `import some_tpu` via jax.config.update
# (env vars are DEAD on this image — sitecustomize imports jax first; CLAUDE.md)

import numpy as np


def _percentiles(samples_ms):
    s = np.sort(np.asarray(samples_ms))
    out = {
        "p50_ms": round(float(np.percentile(s, 50)), 1),
        "p90_ms": round(float(np.percentile(s, 90)), 1),
        "min_ms": round(float(s[0]), 1),
        "max_ms": round(float(s[-1]), 1),
    }
    # p99 from <50 samples is just an interpolation between the two slowest
    # draws (effectively the max); report it only when N supports it
    if len(s) >= 50:
        out["p99_ms"] = round(float(np.percentile(s, 99)), 1)
    return out


def _watchdog(seconds: float):
    """Same contract as bench.py's: the axon tunnel can block forever inside
    a device call; emit a sentinel JSON line and hard-exit instead of
    stalling the harness."""
    import threading

    def fire():
        print(json.dumps({
            "metric": "serving_latency_ms", "value": 0.0,
            "unit": f"TIMEOUT after {seconds}s — TPU backend unresponsive",
        }), flush=True)
        os._exit(3)

    timer = threading.Timer(seconds, fire)
    timer.daemon = True
    timer.start()
    return timer


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
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--phrases", type=int, default=16,
                    help="phrases in the full-song case (~11.2 s each)")
    ap.add_argument("--song-iters", type=int, default=None,
                    help="iterations for the full-song case (default: "
                         "max(20, iters // 4) — each one moves ~16x the "
                         "bytes of a phrase)")
    args = ap.parse_args()

    watchdog = _watchdog(float(os.environ.get("SOME_BENCH_TIMEOUT", 1800)))

    from bench import _make_song_wav, build_engine
    from some_tpu.audio.wavio import load_wav

    engine, config = build_engine()
    sr = config["audio_sample_rate"]
    tmpdir = pathlib.Path("/tmp/some_tpu_bench_lat")
    tmpdir.mkdir(exist_ok=True)

    song_iters = args.song_iters or max(20, args.iters // 4)
    cases = {}
    for name, n_phrases, iters in (
            ("phrase_12s", 1, args.iters),
            (f"song_{args.phrases}x11s", args.phrases, song_iters)):
        wav = tmpdir / f"{name}.wav"
        audio_seconds = _make_song_wav(wav, sr, n_phrases=n_phrases)
        waveform, _ = load_wav(wav, sr=sr, mono=True)
        _request(engine, waveform, sr)  # warm every bucket this case hits
        samples = []
        for _ in range(iters):
            t0 = time.perf_counter()
            smf = _request(engine, waveform, sr)
            samples.append((time.perf_counter() - t0) * 1e3)
            assert len(smf) > 20
        cases[name] = dict(_percentiles(samples), iters=iters,
                           audio_seconds=round(audio_seconds, 1),
                           rtf_at_p50=round(
                               audio_seconds * 1e3 / np.percentile(
                                   np.sort(samples), 50), 1))

    watchdog.cancel()
    print(json.dumps({
        "metric": "serving_latency_ms",
        "unit": ("wall ms per request: slice -> wire encode -> transfer -> "
                 "jitted pipeline -> note fetch -> SMF bytes, warm engine, "
                 "1 chip"),
        **cases,
    }), flush=True)


if __name__ == "__main__":
    main()

"""On-chip A/B: staging lookahead depth for the two dispatch patterns.

Follow-up to tools/ab_stream.py, which showed UNBOUNDED staging (the round-3
first cut) collapses file-to-file from a stable ~204x to a 62-202x swing on
the tunnel — bulk wire bytes of far-ahead groups head-of-line-block the
compute RPCs of the current group on the serial link. This tool measures the
remaining question: does depth-1 double buffering (at most ONE transfer in
flight ahead of compute) recover the overlap win without the flood?

Interleaves depth={0 (serial), 1, 8 (effectively unbounded)} within each
round so link drift hits all legs equally, for both:
  - the headline pattern (same 32x1024 batch re-staged `iters` times)
  - file-to-file (wav -> slicer -> infer() -> MIDI; infer() reads
    SOME_TPU_STREAM_DEPTH per call)

Run on the TPU:  timeout 1500 python tools/ab_depth.py
"""
from __future__ import annotations

import json
import os
import pathlib
import sys
import time
from collections import deque
from concurrent.futures import ThreadPoolExecutor

# persistent compile cache: applied by `import some_tpu` via jax.config.update
# (env vars are DEAD on this image — sitecustomize imports jax first; CLAUDE.md)
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

DEPTHS = (0, 1, 8)


def main() -> None:
    from bench import _make_song_wav, build_engine
    from some_tpu.audio.slicer import SilenceSlicer
    from some_tpu.audio.wavio import load_wav
    from some_tpu.audio.wire import encode_wire
    from some_tpu.utils.midi_file import build_midi_file

    engine, config = build_engine()
    sr = config["audio_sample_rate"]
    B, T, iters = 32, 1024, 5
    n_samples = T * engine.hop - 1
    rng = np.random.default_rng(0)
    t = np.arange(n_samples) / sr
    audio = np.stack([
        (0.3 * np.sin(2 * np.pi * (220 + 40 * i) * t)
         + 0.01 * rng.standard_normal(n_samples)).astype(np.float32)
        for i in range(B)])
    mask = np.ones((B, T), bool)
    audio_i16 = encode_wire(audio, engine.wire)
    audio_seconds = B * n_samples / sr

    def _force(out):
        return np.asarray(out["n_notes"])

    def headline(depth: int) -> float:
        t0 = time.perf_counter()
        if depth == 0:
            for _ in range(iters):
                out = engine.run_bucket(audio_i16, mask)
        else:
            with ThreadPoolExecutor(max_workers=1) as pool:
                queue, submitted = deque(), 0

                def push():
                    nonlocal submitted
                    if submitted < iters:
                        submitted += 1
                        queue.append(pool.submit(
                            engine.stage_inputs, audio_i16, mask))

                for _ in range(depth):
                    push()
                while queue:
                    staged = queue.popleft().result()
                    push()
                    out = engine.run_bucket_staged(*staged)
        _force(out)
        return audio_seconds * iters / (time.perf_counter() - t0)

    tmpdir = pathlib.Path("/tmp/some_tpu_ab")
    tmpdir.mkdir(exist_ok=True)
    wav_path = tmpdir / "song.wav"
    song_seconds = _make_song_wav(wav_path, sr, n_phrases=32)
    midi_path = tmpdir / "song.mid"

    def file_run(depth: int) -> float:
        os.environ["SOME_TPU_STREAM_DEPTH"] = str(depth)
        t0 = time.perf_counter()
        waveform, _ = load_wav(wav_path, sr=sr, mono=True)
        chunks = SilenceSlicer(sr=sr, max_sil_kept=1000).slice(waveform)
        segments = engine.infer([c["waveform"] for c in chunks])
        build_midi_file([c["offset"] for c in chunks], segments,
                        tempo=120).save(midi_path)
        return song_seconds / (time.perf_counter() - t0)

    print("| warmup", file=sys.stderr, flush=True)
    headline(1)
    file_run(1)

    results: dict = {}
    rounds = int(os.environ.get("SOME_AB_ROUNDS", 3))
    for r in range(rounds):
        for depth in DEPTHS:
            h = headline(depth)
            f = file_run(depth)
            results.setdefault(f"headline_d{depth}", []).append(h)
            results.setdefault(f"file_d{depth}", []).append(f)
            print(f"| round {r} depth={depth}: headline {h:.1f}x  "
                  f"file {f:.1f}x", file=sys.stderr, flush=True)

    summary = {k: {"best": round(max(v), 1),
                   "median": round(float(np.median(v)), 1),
                   "all": [round(x, 1) for x in v]}
               for k, v in results.items()}
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()

"""On-chip A/B: does infer()'s staging worker help or hurt on the tunnel?

Background (BENCH_NOTES "Round-3 captures"): the 2026-08-17 09:58 capture
showed e2e_file_stream_rtf 70.1 < e2e_file_rtf 162.9 — the steady-state
multi-song loop (which should be the FASTEST figure) came out 2.3x slower
than the single-song best-of-3. Candidates: (a) the infer() staging worker
(SOME_TPU_STREAM_GROUPS) fighting the tunnel RPC / GIL on one core, (b) link
drift during the capture (the stream phase runs last).

This tool isolates (a) from (b) by interleaving the two configurations
A/B/A/B within one window: each round measures the single-song file run and
the 4-song stream run under STREAM_GROUPS=1 then STREAM_GROUPS=0 back to
back, so link drift hits both legs equally.

Run on the TPU:  timeout 1500 python tools/ab_stream.py
"""
from __future__ import annotations

import json
import os
import pathlib
import sys
import time

# persistent compile cache: applied by `import some_tpu` via jax.config.update
# (env vars are DEAD on this image — sitecustomize imports jax first; CLAUDE.md)
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402


def main() -> None:
    from concurrent.futures import ThreadPoolExecutor

    from bench import _make_song_wav, build_engine
    from some_tpu.audio.slicer import SilenceSlicer
    from some_tpu.audio.wavio import load_wav
    from some_tpu.utils.midi_file import build_midi_file

    engine, config = build_engine()
    sr = config["audio_sample_rate"]
    tmpdir = pathlib.Path("/tmp/some_tpu_ab")
    tmpdir.mkdir(exist_ok=True)
    wav_path = tmpdir / "song.wav"
    audio_seconds = _make_song_wav(wav_path, sr, n_phrases=32)
    midi_path = tmpdir / "song.mid"

    def run_once():
        waveform, _ = load_wav(wav_path, sr=sr, mono=True)
        chunks = SilenceSlicer(sr=sr, max_sil_kept=1000).slice(waveform)
        segments = engine.infer([c["waveform"] for c in chunks])
        build_midi_file([c["offset"] for c in chunks], segments,
                        tempo=120).save(midi_path)

    def stream_run(n_songs=4):
        def prep(_):
            waveform, _sr = load_wav(wav_path, sr=sr, mono=True)
            return SilenceSlicer(sr=sr, max_sil_kept=1000).slice(waveform)

        with ThreadPoolExecutor(max_workers=1) as pool:
            futures = [pool.submit(prep, i) for i in range(n_songs)]
            t0 = time.perf_counter()
            for fut in futures:
                cs = fut.result()
                segments = engine.infer([c["waveform"] for c in cs])
                build_midi_file([c["offset"] for c in cs], segments,
                                tempo=120).save(midi_path)
            return n_songs * audio_seconds / (time.perf_counter() - t0)

    print("| warmup (compiles)", file=sys.stderr, flush=True)
    os.environ["SOME_TPU_STREAM_GROUPS"] = "1"
    run_once()
    os.environ["SOME_TPU_STREAM_GROUPS"] = "0"
    run_once()

    results = {"file_on": [], "file_off": [], "stream_on": [], "stream_off": []}
    rounds = int(os.environ.get("SOME_AB_ROUNDS", 3))
    for r in range(rounds):
        for flag, name in (("1", "on"), ("0", "off")):
            os.environ["SOME_TPU_STREAM_GROUPS"] = flag
            t0 = time.perf_counter()
            run_once()
            results[f"file_{name}"].append(
                audio_seconds / (time.perf_counter() - t0))
            results[f"stream_{name}"].append(stream_run())
            print(f"| round {r} staging={name}: "
                  f"file {results[f'file_{name}'][-1]:.1f}x  "
                  f"stream {results[f'stream_{name}'][-1]:.1f}x",
                  file=sys.stderr, flush=True)

    summary = {k: {"best": round(max(v), 1),
                   "median": round(float(np.median(v)), 1),
                   "all": [round(x, 1) for x in v]}
               for k, v in results.items()}
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()

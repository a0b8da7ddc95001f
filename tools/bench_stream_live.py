"""Live stream.py session on hardware: event latency vs audio time.

Drives the real CLI (`python stream.py`) as a subprocess the way a mic
pipeline would: s16le PCM fed to stdin at REAL-TIME pace (100 ms chunks,
wall-clock synchronized), NDJSON note events timestamped as they arrive on
stdout. For each event the user-felt latency is

    latency = wall_at_emit - phrase_end_audio_time

where phrase_end_audio_time = offset_sec + sum(note_dur_sec) (segments tile
their chunk completely, rests included), and the feed clock IS the audio
clock under real-time pacing. That latency decomposes into (a) the silence
the slicer must observe before it can call the phrase over (inherent to the
algorithm, ~min_interval + RMS lookahead) and (b) wire + compute + decode —
only (b) is implementation; both are reported.

  python tools/bench_stream_live.py [--phrases 6] [--ckpt DIR]

One JSON line. Wrap in `timeout`; the watchdog sentinel fires at
SOME_BENCH_TIMEOUT seconds (default 1800) if the tunnel hangs.
"""
from __future__ import annotations

import argparse
import json
import os
import pathlib
import subprocess
import sys
import threading
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
# persistent compile cache: applied by `import some_tpu` via jax.config.update
# (env vars are DEAD on this image — sitecustomize imports jax first; CLAUDE.md)

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent


def _watchdog(seconds: float):
    def fire():
        print(json.dumps({
            "metric": "stream_live", "value": 0.0,
            "unit": f"TIMEOUT after {seconds}s — TPU backend unresponsive",
        }), flush=True)
        os._exit(3)

    timer = threading.Timer(seconds, fire)
    timer.daemon = True
    timer.start()
    return timer


def _ensure_ckpt(ckpt_dir: pathlib.Path) -> pathlib.Path:
    """Prod-geometry random-weights ckpt + config.yaml, built on CPU in a
    subprocess so the tunnel stays clear for the measured session."""
    ckpt = ckpt_dir / "model_ckpt_steps_1000.ckpt"
    if ckpt.exists():
        return ckpt
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    code = """
import sys; sys.path.insert(0, %r)
import some_tpu, numpy as np, yaml, jax
from __graft_entry__ import _flagship_config
from some_tpu.nn.model import build_midi_extractor
from some_tpu.training.checkpoint import save_checkpoint
config = dict(_flagship_config(), task_cls="training.MIDIExtractionTask")
yaml.safe_dump(config, open(%r + "/config.yaml", "w"))
m = build_midi_extractor(config)
v = m.init(jax.random.PRNGKey(0), np.zeros((1, 32, 80), np.float32))
save_checkpoint(%r, 1000, v["params"], v.get("batch_stats"))
""" % (str(REPO), str(ckpt_dir), str(ckpt_dir))
    subprocess.run([sys.executable, "-c", code], check=True,
                   env=dict(os.environ, SOME_TPU_PLATFORM="cpu"),
                   timeout=600)
    return ckpt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--phrases", type=int, default=6)
    ap.add_argument("--ckpt", default="/tmp/some_tpu_stream_ckpt")
    ap.add_argument("--chunk-ms", type=float, default=100.0)
    ap.add_argument("--pace", type=float, default=1.0,
                    help="feed speed as a multiple of real time "
                         "(1.0 = live mic; 0 = as fast as possible)")
    args = ap.parse_args()

    watchdog = _watchdog(float(os.environ.get("SOME_BENCH_TIMEOUT", 1800)))

    ckpt = _ensure_ckpt(pathlib.Path(args.ckpt))

    from bench import _make_song_wav
    from some_tpu.audio.wavio import load_wav

    sr = 44100
    wav = pathlib.Path(args.ckpt) / f"song_{args.phrases}.wav"
    audio_seconds = _make_song_wav(wav, sr, n_phrases=args.phrases)
    waveform, _ = load_wav(wav, sr=sr, mono=True)
    pcm = np.clip(waveform * 32768.0, -32768, 32767).astype("<i2").tobytes()

    proc = subprocess.Popen(
        [sys.executable, str(REPO / "stream.py"), "--model", str(ckpt),
         "--pcm-format", "s16le", "--chunk-ms", str(args.chunk_ms)],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE,
        stderr=subprocess.PIPE, cwd=str(REPO))

    events = []   # (wall_since_start, parsed_json)
    t_start = None

    def reader():
        for line in proc.stdout:
            try:
                ev = json.loads(line)
            except ValueError:
                continue
            events.append((time.perf_counter() - t_start, ev))

    # stream.py prewarms its bucket programs then prints a ready marker on
    # stderr; a real mic pipeline opens the source only after that, so the
    # latency clock must not start before it either (round-4 measured the
    # un-prewarmed alternative: 32.8 s first-event latency)
    t_ready0 = time.perf_counter()
    for line in proc.stderr:
        sys.stderr.write(line.decode(errors="replace"))
        if b"| ready" in line:
            break
    warmup_s = time.perf_counter() - t_ready0
    threading.Thread(  # keep draining stderr so the child never blocks on it
        target=lambda: [None for _ in proc.stderr], daemon=True).start()

    # Give the engine its slow construction (weight upload, first jit) BEFORE
    # the clock starts: feed 1 s of silence and wait for the process to be
    # alive and consuming. Real mics also open before anyone sings.
    chunk_bytes = int(sr * args.chunk_ms / 1000.0) * 2
    proc.stdin.write(b"\x00" * (sr * 2))
    proc.stdin.flush()

    t_start = time.perf_counter()
    threading.Thread(target=reader, daemon=True).start()
    silence_lead_s = 1.0  # the pre-fed silence shifts every audio offset
    for off in range(0, len(pcm), chunk_bytes):
        proc.stdin.write(pcm[off:off + chunk_bytes])
        proc.stdin.flush()
        if args.pace > 0:
            target = (off + chunk_bytes) / 2 / sr / args.pace
            lag = target - (time.perf_counter() - t_start)
            if lag > 0:
                time.sleep(lag)
    proc.stdin.close()
    proc.wait(timeout=1200)
    time.sleep(0.2)  # drain the reader

    fed_wall = time.perf_counter() - t_start
    latencies = []
    for wall, ev in events:
        phrase_end_audio = (ev["offset_sec"] - silence_lead_s
                            + sum(ev["note_dur_sec"]))
        if args.pace > 0:
            latencies.append(wall - phrase_end_audio / args.pace)
    result = {
        "metric": "stream_live",
        "unit": ("seconds from last sample of a phrase being FED to its "
                 "note event on stdout, real-time paced feed, 1 chip"),
        "phrases_fed": args.phrases,
        "events": len(events),
        "audio_seconds": round(audio_seconds, 1),
        "feed_wall_s": round(fed_wall, 1),
        "warmup_s": round(warmup_s, 1),
        "pace": args.pace,
    }
    if latencies:
        # the slicer cannot decide a phrase ended before it has SEEN the
        # silence after it: min_interval (300 ms) of hop-grid scan + the
        # RMS window lookahead; everything above that floor is wire+compute
        result["event_latency_s"] = {
            "p50": round(float(np.percentile(latencies, 50)), 2),
            "max": round(float(max(latencies)), 2),
            "min": round(float(min(latencies)), 2),
            "all": [round(x, 2) for x in latencies],
        }
    if len(events) != args.phrases:
        result["warning"] = (f"fed {args.phrases} phrases but got "
                             f"{len(events)} events")
    watchdog.cancel()
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()

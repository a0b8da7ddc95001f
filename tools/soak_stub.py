"""Off-chip serve-soak leak bisection (VERDICT r4 Weak #4 / Next #3).

The round-4 hardware soak (.bench_logs/serve_r4.json) grew RSS +310.5 MB in
soak 1 and +307.2 MB in an identical soak 2 — ~1 MB per request with NO
plateau, which is bench_serve.py's own definition of a real leak. This tool
reproduces the soak OFF the chip with a stub engine so the growth can be
attributed to a layer:

  --mode http        full serve.make_server HTTP path (handlers + dispatcher
                     + wav decode + slicing + SMF assembly), stub engine
  --mode dispatcher  BatchingDispatcher only: jobs submitted in-process,
                     same chunk payloads, no HTTP/socket layer
  --mode parse       per-request load_wav + slice_waveform in a thread pool,
                     no dispatcher (isolates the handler-side work)
  --mode engine      the REAL engine (bench.build_engine): engine.infer in a
                     serial loop, no HTTP — isolates the device/axon layer.
                     Run on the TPU; the off-chip modes above were all flat
                     (r5: <=4 MB survives trim per 296 requests), so this is
                     where the r4 hardware slope must live if it is real.

After each soak it reports RSS, then gc.collect() + glibc malloc_trim(0) and
reports RSS again: live-object leaks survive the trim, free-but-unreturned
heap (arena caching / fragmentation) does not. tracemalloc's top growth
sites catch any Python-side retention directly.

  python tools/soak_stub.py --mode http --requests 296 --clients 8

Prints one JSON line.
"""
from __future__ import annotations

import argparse
import io
import json
import pathlib
import sys
import threading
import time
import tracemalloc
import urllib.request

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


from tools._bench_util import rss_mb as _rss_mb  # noqa: E402
from tools._bench_util import trim as _gc_trim  # noqa: E402


class StubEngine:
    """Engine-shaped object: same call surface serve.py touches, zero device
    work. Returns one tiny segment per chunk so the SMF/JSON assembly path
    runs for real."""

    max_batch_chunks = 32
    wire = "int16"
    wire_decision = None
    frame_buckets = (768,)

    def infer(self, waveforms):
        out = []
        for w in waveforms:
            n = max(1, len(w) // 44100)
            out.append({
                "note_midi": np.full(n, 60.0, np.float64),
                "note_dur": np.full(n, 1.0, np.float64),
                "note_rest": np.zeros(n, bool),
            })
        return out

    def prewarm(self, *a, **k):
        return 0

    def maybe_reprobe_wire(self):
        pass


def _make_wav(path: pathlib.Path, sr: int) -> float:
    from bench import _make_song_wav

    return _make_song_wav(path, sr, n_phrases=1)


def _soak_http(base: str, body: bytes, requests: int, clients: int) -> list:
    errors: list = []
    rounds = max(1, requests // clients)

    def loop():
        for _ in range(rounds):
            try:
                req = urllib.request.Request(
                    base + "/transcribe?tempo=120", data=body, method="POST",
                    headers={"Content-Type": "audio/wav"})
                with urllib.request.urlopen(req, timeout=60) as resp:
                    smf = resp.read()
                assert smf[:4] == b"MThd"
            except Exception as exc:  # noqa: BLE001
                errors.append(repr(exc))

    threads = [threading.Thread(target=loop) for _ in range(clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    return errors


def _soak_dispatcher(dispatcher, waveform, sr, requests: int,
                     clients: int) -> list:
    from serve import TranscribeJob
    from some_tpu.inference.pipeline import slice_waveform
    from some_tpu.utils.midi_file import build_midi_file

    errors: list = []
    rounds = max(1, requests // clients)

    def loop():
        for _ in range(rounds):
            chunks = slice_waveform(waveform, sr)
            job = TranscribeJob([c["waveform"] for c in chunks],
                                [c["offset"] for c in chunks], 120.0,
                                audio_seconds=len(waveform) / sr)
            if not dispatcher.submit(job):
                errors.append("queue full")
                continue
            if not job.done.wait(timeout=60):
                errors.append("timeout")
                continue
            build_midi_file(job.offsets, job.segments, tempo=120.0).serialize()

    threads = [threading.Thread(target=loop) for _ in range(clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    return errors


def _soak_engine(engine, waveform, sr: int, requests: int) -> list:
    """Serial engine.infer loop over the request's sliced chunks — exactly
    the per-request device work the dispatcher does, none of the HTTP."""
    from some_tpu.inference.pipeline import slice_waveform

    errors: list = []
    chunks = [c["waveform"] for c in slice_waveform(waveform, sr)]
    for _ in range(requests):
        try:
            engine.infer(list(chunks))
        except Exception as exc:  # noqa: BLE001
            errors.append(repr(exc))
    return errors


def _soak_parse(body: bytes, sr: int, requests: int, clients: int) -> list:
    from some_tpu.audio.wavio import load_wav
    from some_tpu.inference.pipeline import slice_waveform

    errors: list = []
    rounds = max(1, requests // clients)

    def loop():
        for _ in range(rounds):
            try:
                waveform, _ = load_wav(io.BytesIO(body), sr=sr, mono=True)
                slice_waveform(waveform, sr)
            except Exception as exc:  # noqa: BLE001
                errors.append(repr(exc))

    threads = [threading.Thread(target=loop) for _ in range(clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    return errors


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode",
                    choices=["http", "dispatcher", "parse", "engine"],
                    default="http")
    ap.add_argument("--requests", type=int, default=296)
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--soaks", type=int, default=2)
    ap.add_argument("--tracemalloc", action="store_true")
    args = ap.parse_args()

    sr = 44100
    tmpdir = pathlib.Path("/tmp/some_tpu_soak_stub")
    tmpdir.mkdir(exist_ok=True)
    wav_path = tmpdir / "phrase.wav"
    _make_wav(wav_path, sr)
    body = wav_path.read_bytes()

    engine = StubEngine()
    base = None
    dispatcher = None
    httpd = None
    if args.mode == "http":
        from serve import make_server

        httpd, dispatcher = make_server(
            engine, {"audio_sample_rate": sr}, "127.0.0.1", 0)
        port = httpd.server_address[1]
        base = f"http://127.0.0.1:{port}"
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
    elif args.mode == "dispatcher":
        from serve import BatchingDispatcher

        dispatcher = BatchingDispatcher(engine)
    elif args.mode == "engine":
        from bench import build_engine

        engine, _config = build_engine()

    waveform = None
    if args.mode in ("dispatcher", "engine"):
        from some_tpu.audio.wavio import load_wav

        waveform, _ = load_wav(io.BytesIO(body), sr=sr, mono=True)

    # warm once (thread pool spin-up, module imports, bucket compiles in
    # engine mode) before baselining
    if args.mode == "http":
        _soak_http(base, body, args.clients, args.clients)
    elif args.mode == "dispatcher":
        _soak_dispatcher(dispatcher, waveform, sr, args.clients, args.clients)
    elif args.mode == "engine":
        _soak_engine(engine, waveform, sr, 2)
    else:
        _soak_parse(body, sr, args.clients, args.clients)
    _gc_trim()

    if args.tracemalloc:
        tracemalloc.start(10)
        snap0 = tracemalloc.take_snapshot()

    result = {"metric": "soak_stub", "mode": args.mode,
              "requests_per_soak": args.requests, "clients": args.clients,
              "body_mb": round(len(body) / 2**20, 2), "soaks": []}
    rss_prev = _rss_mb()
    result["rss_start_mb"] = round(rss_prev, 1)
    for i in range(args.soaks):
        t0 = time.perf_counter()
        if args.mode == "http":
            errors = _soak_http(base, body, args.requests, args.clients)
        elif args.mode == "dispatcher":
            errors = _soak_dispatcher(dispatcher, waveform, sr,
                                      args.requests, args.clients)
        elif args.mode == "engine":
            errors = _soak_engine(engine, waveform, sr, args.requests)
        else:
            errors = _soak_parse(body, sr, args.requests, args.clients)
        wall = time.perf_counter() - t0
        rss_raw = _rss_mb()
        _gc_trim()
        rss_trimmed = _rss_mb()
        result["soaks"].append({
            "wall_s": round(wall, 1), "errors": len(errors),
            "rss_mb": round(rss_raw, 1),
            "growth_mb": round(rss_raw - rss_prev, 1),
            "rss_after_trim_mb": round(rss_trimmed, 1),
            "survives_trim_mb": round(rss_trimmed - rss_prev, 1),
        })
        rss_prev = rss_trimmed
        if errors:
            result["soaks"][-1]["first_error"] = errors[0]

    if args.tracemalloc:
        snap1 = tracemalloc.take_snapshot()
        top = snap1.compare_to(snap0, "lineno")[:8]
        result["tracemalloc_top"] = [
            {"site": str(s.traceback), "growth_kb": round(s.size_diff / 1024)}
            for s in top if s.size_diff > 64 * 1024]

    if httpd is not None:
        httpd.shutdown()
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()

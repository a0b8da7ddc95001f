"""serve.py on hardware: concurrent clients + soak through the real HTTP path.

bench_latency.py times ONE request on a warm engine; this drives the actual
serving stack — ThreadingHTTPServer -> BatchingDispatcher -> engine — with N
concurrent clients, so it measures what production traffic sees: queueing,
micro-batching across requests, and tail latency under contention. Then a
soak phase (hundreds of requests) watches RSS and throughput for drift.

The server runs in-process (serve.make_server) so RSS covers the engine and
dispatcher; clients are plain urllib threads over 127.0.0.1.

  python tools/bench_serve.py [--clients 8] [--rounds 5] [--soak 300]

Prints one JSON line. Same watchdog contract as bench.py: the axon tunnel
can hang a device call forever, so a sentinel line + hard exit fires at
SOME_BENCH_TIMEOUT seconds (default 1800).
"""
from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys
import threading
import time
import urllib.request

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
# persistent compile cache: applied by `import some_tpu` via jax.config.update
# (env vars are DEAD on this image — sitecustomize imports jax first; CLAUDE.md)

import numpy as np


def _watchdog(seconds: float):
    from tools._bench_util import start_watchdog
    return start_watchdog(seconds, {
        "metric": "serve_bench", "value": 0.0,
        "unit": f"TIMEOUT after {seconds}s — TPU backend unresponsive"})


from tools._bench_util import rss_mb as _rss_mb  # noqa: E402


def _percentiles(samples_ms):
    s = np.sort(np.asarray(samples_ms))
    out = {
        "p50_ms": round(float(np.percentile(s, 50)), 1),
        "p90_ms": round(float(np.percentile(s, 90)), 1),
        "min_ms": round(float(s[0]), 1),
        "max_ms": round(float(s[-1]), 1),
        "n": len(s),
    }
    if len(s) >= 50:
        out["p99_ms"] = round(float(np.percentile(s, 99)), 1)
    return out


def _client_loop(base: str, body: bytes, rounds: int, samples: list,
                 errors: list, barrier: threading.Barrier) -> None:
    barrier.wait()
    for _ in range(rounds):
        t0 = time.perf_counter()
        try:
            req = urllib.request.Request(
                base + "/transcribe?tempo=120", data=body, method="POST",
                headers={"Content-Type": "audio/wav"})
            with urllib.request.urlopen(req, timeout=600) as resp:
                smf = resp.read()
            assert smf[:4] == b"MThd", "response is not SMF"
            samples.append((time.perf_counter() - t0) * 1e3)
        except Exception as exc:  # noqa: BLE001 — recorded, not fatal
            errors.append(repr(exc))


def _get_json(base: str, path: str) -> dict:
    with urllib.request.urlopen(base + path, timeout=60) as resp:
        return json.loads(resp.read())


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--rounds", type=int, default=5,
                    help="requests per client in the concurrent phase")
    ap.add_argument("--soak", type=int, default=300,
                    help="total requests in the soak phase (0 = skip)")
    ap.add_argument("--max-wait-ms", type=float, default=25.0)
    ap.add_argument("--no-fast-lane", action="store_true",
                    help="disable the empty-queue immediate dispatch (A/B)")
    args = ap.parse_args()

    watchdog = _watchdog(float(os.environ.get("SOME_BENCH_TIMEOUT", 1800)))

    from bench import _make_song_wav, build_engine
    from serve import make_server

    engine, config = build_engine()
    sr = config["audio_sample_rate"]
    tmpdir = pathlib.Path("/tmp/some_tpu_bench_serve")
    tmpdir.mkdir(exist_ok=True)
    wav_path = tmpdir / "phrase.wav"
    audio_seconds = _make_song_wav(wav_path, sr, n_phrases=1)
    body = wav_path.read_bytes()

    # prewarm exactly what this load shape rides: the phrase's frame bucket
    # across every row bucket concurrency can produce (the production knob
    # is serve.py --prewarm; an uncompiled row bucket landing mid-traffic
    # measured 92 s on the tunnel)
    n_frames = len(np.zeros(int(sr * 11.2))) // config["hop_size"] + 1
    from some_tpu.inference.base_infer import pick_bucket
    bucket = pick_bucket(n_frames, engine.frame_buckets)
    rows = tuple(r for r in (1, 2, 3, 4, 6, 8, 12, 16, 24, 32)
                 if r <= max(args.clients, 1))
    warmed = engine.prewarm([bucket], rows=rows)
    print(f"| prewarmed {warmed} programs (T={bucket}, rows up to "
          f"{args.clients})", file=sys.stderr)

    httpd, dispatcher = make_server(engine, config, "127.0.0.1", 0,
                                    max_wait_ms=args.max_wait_ms,
                                    fast_lane=not args.no_fast_lane)
    port = httpd.server_address[1]
    base = f"http://127.0.0.1:{port}"
    threading.Thread(target=httpd.serve_forever, daemon=True).start()

    # warm every (frame, row) bucket this load shape hits: a solo request
    # only compiles the 1-row program, but concurrent traffic rides wider
    # row buckets — fire one untimed burst at full concurrency (compiles
    # excluded from timing, exactly like a production server after its
    # first traffic spike)
    warm_errors: list = []
    warm_barrier = threading.Barrier(args.clients)
    warm = [threading.Thread(target=_client_loop,
                             args=(base, body, 1, [], warm_errors,
                                   warm_barrier))
            for _ in range(args.clients)]
    for t in warm:
        t.start()
    for t in warm:
        t.join()
    assert not warm_errors, f"warmup failed: {warm_errors[0]}"

    result = {"metric": "serve_bench",
              "unit": ("wall ms per HTTP request, N concurrent clients, "
                       "one ~11 s phrase each, warm server, 1 chip"),
              "audio_seconds_per_request": round(audio_seconds, 1),
              "max_wait_ms": args.max_wait_ms,
              "fast_lane": not args.no_fast_lane}

    # ---- phase 1: concurrent clients --------------------------------------
    samples: list = []
    errors: list = []
    barrier = threading.Barrier(args.clients)
    stats_before = _get_json(base, "/stats")
    threads = [threading.Thread(
        target=_client_loop,
        args=(base, body, args.rounds, samples, errors, barrier))
        for _ in range(args.clients)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    stats = _get_json(base, "/stats")
    done = len(samples)
    result["concurrent"] = dict(
        _percentiles(samples), clients=args.clients, rounds=args.rounds,
        errors=len(errors), wall_s=round(wall, 2),
        requests_per_s=round(done / wall, 2),
        served_audio_rtf=round(done * audio_seconds / wall, 1),
        max_jobs_per_batch=stats["max_jobs_per_batch"],
        batches=stats["batches"] - stats_before["batches"],
        server_rtf=round(stats["rtf"], 1),
        job_queue_wait_ms=stats.get("job_queue_wait_ms"),
        job_device_ms=stats.get("job_device_ms"))
    if errors:
        result["concurrent"]["first_error"] = errors[0]
    # micro-batching must actually engage under concurrency
    result["concurrent"]["microbatching_engaged"] = (
        stats["max_jobs_per_batch"] >= 2)

    # ---- phase 2: soak -----------------------------------------------------
    if args.soak:
        rss0 = _rss_mb()
        soak_samples: list = []
        soak_errors: list = []
        rounds = max(1, args.soak // args.clients)
        barrier = threading.Barrier(args.clients)
        threads = [threading.Thread(
            target=_client_loop,
            args=(base, body, rounds, soak_samples, soak_errors, barrier))
            for _ in range(args.clients)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        health = _get_json(base, "/healthz")
        soak_stats = _get_json(base, "/stats")
        rss1 = _rss_mb()
        # second identical soak in the same process: allocator fragmentation
        # plateaus (second-run growth << first), a real leak keeps the slope
        rerun_samples: list = []
        barrier = threading.Barrier(args.clients)
        threads = [threading.Thread(
            target=_client_loop,
            args=(base, body, rounds, rerun_samples, soak_errors, barrier))
            for _ in range(args.clients)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        rss2 = _rss_mb()
        n = len(soak_samples)
        # drift check: the last quarter vs the first quarter of the run
        q = max(1, n // 4)
        result["soak"] = dict(
            _percentiles(soak_samples), requests=n,
            errors=len(soak_errors), wall_s=round(wall, 1),
            requests_per_s=round(n / wall, 2),
            served_audio_rtf=round(n * audio_seconds / wall, 1),
            first_quarter_p50_ms=round(
                float(np.percentile(soak_samples[:q], 50)), 1),
            last_quarter_p50_ms=round(
                float(np.percentile(soak_samples[-q:], 50)), 1),
            rss_start_mb=round(rss0, 1), rss_end_mb=round(rss1, 1),
            rss_growth_mb=round(rss1 - rss0, 1),
            rss_second_soak_growth_mb=round(rss2 - rss1, 1),
            second_soak_p50_ms=round(
                float(np.percentile(rerun_samples, 50)), 1)
            if rerun_samples else None,
            healthz=health.get("status"),
            job_queue_wait_ms=soak_stats.get("job_queue_wait_ms"),
            job_device_ms=soak_stats.get("job_device_ms"))
        if soak_errors:
            result["soak"]["first_error"] = soak_errors[0]

    httpd.shutdown()
    watchdog.cancel()
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()

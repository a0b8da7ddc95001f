"""Bisect the serve-soak RSS slope: bare device calls, no HTTP, no dispatcher.

Round-4's on-chip soak grew ~1 MB/request with NO plateau across two
identical 296-request soaks (.bench_logs/serve_r4.json), while the same
server + engine on the CPU backend decays to a plateau (+333/+50/+9.5 MB
across three soaks — warmup then fragmentation noise, round-5 repro). The
remaining difference is the axon tunnel client. This probe loops the
engine's run_bucket with a fixed host-resident input — each call ships one
wire buffer through the tunnel and fetches one result — and samples RSS:

  - RSS slope here ~= the soak's per-request growth  ->  the per-call RPC
    path (tunnel client) retains buffers; leak is outside the repo.
  - RSS flat here  ->  the retention needs the serving stack above
    run_bucket; bisect upward (stage_inputs, dispatcher, handlers).

  python tools/probe_rss_device.py [--calls 300] [--every 50]

One JSON line; wrap in `timeout` (the tunnel can hang forever).
"""
from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys
import threading
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
# persistent compile cache: applied by `import some_tpu` via jax.config.update
# (env vars are DEAD on this image — sitecustomize imports jax first; CLAUDE.md)

import numpy as np


from tools._bench_util import rss_mb as _rss_mb  # noqa: E402
from tools._bench_util import start_watchdog, trim  # noqa: E402


def _watchdog(seconds: float):
    return start_watchdog(seconds, {
        "metric": "rss_device_probe", "value": 0.0,
        "unit": f"TIMEOUT after {seconds}s"})


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--calls", type=int, default=300)
    ap.add_argument("--every", type=int, default=50)
    ap.add_argument("--rows", type=int, default=1,
                    help="batch rows per call (1 = the solo-request shape)")
    ap.add_argument("--frames", type=int, default=1024)
    ap.add_argument("--same-buffer", action="store_true",
                    help="reuse ONE host input array across calls (no fresh "
                    "np.array copy): if the slope vanishes, the client "
                    "retains state per distinct input array")
    ap.add_argument("--fetch-every", type=int, default=1,
                    help="force-fetch only every Nth result: if the slope "
                    "follows fetches, the retention is on the download leg")
    ap.add_argument("--tracemalloc", action="store_true",
                    help="attribute Python-visible growth by allocation "
                    "site: a native-client leak shows RSS slope with "
                    "nothing here")
    args = ap.parse_args()

    watchdog = _watchdog(float(os.environ.get("SOME_BENCH_TIMEOUT", 1800)))

    from bench import build_engine
    from some_tpu.audio.wire import encode_wire

    engine, config = build_engine()
    sr = config["audio_sample_rate"]
    n_samples = args.frames * engine.hop - 1
    rng = np.random.default_rng(0)
    t = np.arange(n_samples * engine.wire_factor) / sr
    wave = (0.3 * np.sin(2 * np.pi * 330 * t)).astype(np.float32)
    if engine.wire_factor > 1:
        from some_tpu.audio.wavio import decimate_wire
        wave = decimate_wire(wave, engine.wire_factor)[:n_samples]
    audio = np.stack([wave] * args.rows)
    mask = np.ones((args.rows, args.frames), bool)
    audio_w = encode_wire(audio, engine.wire)

    out = engine.run_bucket(audio_w, mask)          # compile / cache load
    np.asarray(out["n_notes"])[:1]

    samples = []
    snap0 = None
    if args.tracemalloc:
        import tracemalloc
        tracemalloc.start(10)
        snap0 = tracemalloc.take_snapshot()
    r_start = _rss_mb()
    t0 = time.perf_counter()
    for i in range(1, args.calls + 1):
        # fresh host buffer each call, like a fresh HTTP body would be
        a = audio_w if args.same_buffer else np.array(audio_w, copy=True)
        out = engine.run_bucket(a, mask)
        if i % args.fetch_every == 0:
            np.asarray(out["n_notes"])[:1]          # force (lazy backend)
        if i % args.every == 0:
            samples.append({"calls": i, "rss_mb": round(_rss_mb(), 1)})
            print(f"| {i} calls: rss {samples[-1]['rss_mb']} MB",
                  file=sys.stderr, flush=True)
    wall = time.perf_counter() - t0
    r_end = _rss_mb()
    # live-object leaks survive gc + malloc_trim; allocator-cached free
    # heap does not (same discriminator as tools/soak_stub.py)
    trim()
    r_trim = _rss_mb()
    trace_top = None
    if snap0 is not None:
        import tracemalloc
        snap1 = tracemalloc.take_snapshot()
        trace_top = [
            {"site": str(s.traceback), "growth_kb": round(s.size_diff / 1024)}
            for s in snap1.compare_to(snap0, "lineno")[:8]
            if s.size_diff > 256 * 1024]
        traced_mb = tracemalloc.get_traced_memory()[0] / 2**20
    watchdog.cancel()
    print(json.dumps({
        "metric": "rss_device_probe",
        "unit": "MB RSS growth over bare run_bucket calls, fresh host "
                "buffer per call, forced fetch, no HTTP/dispatcher",
        "calls": args.calls, "rows": args.rows, "frames": args.frames,
        "same_buffer": args.same_buffer, "fetch_every": args.fetch_every,
        "wire": engine.wire,
        "rss_start_mb": round(r_start, 1), "rss_end_mb": round(r_end, 1),
        "rss_growth_mb": round(r_end - r_start, 1),
        "rss_after_trim_mb": round(r_trim, 1),
        "survives_trim_mb": round(r_trim - r_start, 1),
        "mb_per_call": round((r_end - r_start) / args.calls, 3),
        "wall_s": round(wall, 1), "trace": samples,
        **({"tracemalloc_top": trace_top,
            "python_traced_mb": round(traced_mb, 1)}
           if trace_top is not None else {}),
        "platform": jax_platform()}), flush=True)


def jax_platform() -> str:
    import jax
    return jax.devices()[0].platform


if __name__ == "__main__":
    main()

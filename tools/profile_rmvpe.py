"""Attribute the RMVPE on-chip forward: compile vs transfer vs compute.

Round-4's binarize captures showed 31-79 s per mel2hidden_batch forward
(.bench_logs/binarize{,_warm}_r4.json) against a back-of-envelope ~0.5 s of
U-Net compute and ~1 s of wire bytes — two orders of magnitude unexplained.
This isolates each leg for one production-shaped forward:

  compile_s       first call with a never-before-seen shape (persistent
                  cache cold or hot — reported either way)
  cached_call_s   a SECOND process would pay this; here: same shape,
                  new input values, host-resident args (transfer + compute)
  compute_s       device-resident args, forced fetch of 1 element
                  (pure chip time for the E2E0 program)
  fetch_s         np.asarray of the full [B,T,360] hidden (download leg)

  timeout 1800 python tools/profile_rmvpe.py [--rows 8] [--frames 3072]

One JSON line. SOME_TPU_PLATFORM=cpu for a CPU sanity run.
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


def _watchdog(seconds: float):
    from tools._bench_util import start_watchdog
    return start_watchdog(seconds, {
        "metric": "rmvpe_profile", "value": 0.0,
        "unit": f"TIMEOUT after {seconds}s"})


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=8)
    ap.add_argument("--frames", type=int, default=3072,
                    help="bucket frames (30 s of 10 ms hops -> 3072)")
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    watchdog = _watchdog(float(os.environ.get("SOME_BENCH_TIMEOUT", 1800)))

    import jax

    import some_tpu  # noqa: F401  (platform env shim)
    from some_tpu.nn.rmvpe import N_MELS, RMVPE

    rmvpe = RMVPE(None)
    rng = np.random.default_rng(0)
    mel = rng.standard_normal(
        (args.rows, args.frames, N_MELS)).astype(np.float32)
    t_valid = np.full((args.rows,), args.frames - 32, np.int32)

    def force(out):
        return np.asarray(out[..., :1, :1])  # 1 element: forces the chain

    # ---- compile (or persistent-cache load) -------------------------------
    t0 = time.perf_counter()
    out = rmvpe._forward(rmvpe.variables, mel, t_valid)
    force(out)
    compile_s = time.perf_counter() - t0

    # ---- host-resident args: transfer + compute (the binarize call shape) -
    cached_call_s = float("inf")
    for _ in range(args.iters):
        fresh = np.array(mel, copy=True)   # new host buffer, like a new song
        t0 = time.perf_counter()
        out = rmvpe._forward(rmvpe.variables, fresh, t_valid)
        force(out)
        cached_call_s = min(cached_call_s, time.perf_counter() - t0)

    # ---- device-resident args: pure compute --------------------------------
    mel_dev = jax.device_put(mel)
    tv_dev = jax.device_put(t_valid)
    jax.block_until_ready((mel_dev, tv_dev))
    force(rmvpe._forward(rmvpe.variables, mel_dev, tv_dev))
    compute_s = float("inf")
    for _ in range(args.iters):
        t0 = time.perf_counter()
        out = rmvpe._forward(rmvpe.variables, mel_dev, tv_dev)
        force(out)
        compute_s = min(compute_s, time.perf_counter() - t0)

    # ---- full-hidden download (what mel2hidden_batch fetches) -------------
    fetch_s = float("inf")
    for _ in range(args.iters):
        out = rmvpe._forward(rmvpe.variables, mel_dev, tv_dev)
        force(out)                       # compute already done when we time
        t0 = time.perf_counter()
        h = np.asarray(out)
        fetch_s = min(fetch_s, time.perf_counter() - t0)

    audio_s = args.rows * args.frames * 0.01   # 10 ms hop
    watchdog.cancel()
    print(json.dumps({
        "metric": "rmvpe_profile",
        "unit": "seconds per leg of one E2E0 forward",
        "rows": args.rows, "frames": args.frames,
        "audio_seconds": round(audio_s, 1),
        "compile_s": round(compile_s, 2),
        "cached_call_s": round(cached_call_s, 3),
        "compute_s": round(compute_s, 3),
        "fetch_hidden_s": round(fetch_s, 3),
        "hidden_mb": round(h.nbytes / 1e6, 1),
        "mel_mb": round(mel.nbytes / 1e6, 1),
        "compute_rtf": round(audio_s / compute_s, 1),
        "e2e_rtf": round(audio_s / (cached_call_s + fetch_s), 1),
        "platform": jax.devices()[0].platform}), flush=True)


if __name__ == "__main__":
    main()

"""Shared helpers for the measurement tools in tools/ (code-review r5:
_rss_mb / watchdog / gc+malloc_trim had drifted into 3-4 per-file copies).

bench.py keeps its own watchdog — its sentinel embeds the last-valid
capture, a shape none of the tools share."""
from __future__ import annotations

import ctypes
import gc
import json
import os
import threading


def rss_mb() -> float:
    """Resident set size of this process in MB (Linux /proc)."""
    with open("/proc/self/status") as fh:
        for line in fh:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return 0.0


def trim() -> None:
    """gc + glibc malloc_trim(0): live-object leaks survive this, free-but-
    unreturned heap (allocator caching / fragmentation) does not — the
    discriminator used throughout the round-5 leak adjudication."""
    gc.collect()
    try:
        ctypes.CDLL("libc.so.6").malloc_trim(0)
    except Exception:
        pass


def start_watchdog(seconds: float, sentinel: dict, exit_code: int = 3):
    """Print ``sentinel`` as one JSON line and hard-exit after ``seconds``.

    The axon-style device tunnel can hang a call indefinitely (CLAUDE.md);
    every tool that touches the device emits a timeout sentinel so the
    capture harness records the outage instead of stalling. Returns the
    timer; call .cancel() on success."""
    def fire():
        print(json.dumps(dict(sentinel)), flush=True)
        os._exit(exit_code)

    timer = threading.Timer(seconds, fire)
    timer.daemon = True
    timer.start()
    return timer

"""Profiling / tracing hooks (SURVEY.md §5.1 — absent upstream).

* ``trace(dir)`` — context manager around ``jax.profiler`` producing a
  TensorBoard-loadable trace of device + host activity.
* ``start_server(port)`` — live profiling endpoint for
  ``tensorboard --logdir`` capture on a running job.
* ``RtfMeter`` — wall-clock real-time-factor meter; the reference's only
  perf instrument was an inline RTF print in the web UI (webui.py:51-57),
  here it's reusable across CLI, web UI, and benchmarks.
"""
from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(log_dir: str, host_tracer_level: int = 2):
    import jax

    jax.profiler.start_trace(log_dir, create_perfetto_link=False)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def start_server(port: int = 9999):
    import jax

    return jax.profiler.start_server(port)


class RtfMeter:
    """Accumulates (audio_seconds, wall_seconds) across calls."""

    def __init__(self):
        self.audio_seconds = 0.0
        self.wall_seconds = 0.0
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.wall_seconds += time.perf_counter() - self._t0
        self._t0 = None

    def add_audio(self, seconds: float):
        self.audio_seconds += seconds

    @property
    def rtf(self) -> float:
        """Processing time per audio second (lower is better)."""
        return self.wall_seconds / self.audio_seconds if self.audio_seconds else 0.0

    @property
    def speed(self) -> float:
        """Times-faster-than-real-time (higher is better)."""
        return self.audio_seconds / self.wall_seconds if self.wall_seconds else 0.0

    def report(self) -> str:
        return (f"{self.audio_seconds:.2f}s audio in {self.wall_seconds:.2f}s "
                f"({self.speed:.1f}x real-time, RTF {self.rtf:.5f})")

"""Production batch-serving HTTP API: wav in, MIDI (or JSON notes) out.

Goes beyond the reference's interactive webui (reference: webui.py — one
request at a time through gradio): a dispatcher thread MICRO-BATCHES chunks
across concurrent requests into the bucketed static-shape engine, so many
small requests ride one XLA dispatch per bucket instead of one per caller.
This is the TPU-idiomatic serving shape: the engine's per-bucket programs
are already batched; the server just keeps their rows full.

Endpoints
  POST /transcribe?tempo=120[&format=json]   body: WAV bytes
       -> audio/midi SMF bytes (or JSON note arrays with format=json)
  GET  /healthz  -> {"status": "ok"|"stalled", "queue_depth": N, ...}
  GET  /stats    -> cumulative counts, audio seconds, wall seconds, RTF

Stdlib-only (http.server), same as the webui fallback: no extra deps.
"""
from __future__ import annotations

import io
import json
import pathlib
import queue
import threading
import time
from typing import List, Optional

import click

from some_tpu.inference.pipeline import (MAX_DURATION_SEC, segments_to_json,
                                         slice_waveform)

# DoS guard on the request body itself; the per-request duration gate is
# MAX_DURATION_SEC, this only bounds what we are willing to buffer. 512 MB
# covers a MAX_DURATION_SEC (20-min) 48 kHz upload in any sane encoding
# (float32 stereo ~460 MB, int16 stereo ~230 MB); a float64-stereo WAV of
# that length (~920 MB) is deliberately rejected 413 — re-encode it.
MAX_BODY_BYTES = 512 * 1024 * 1024


class TranscribeJob:
    __slots__ = ("chunks", "offsets", "tempo", "audio_seconds", "done",
                 "segments", "error", "resolution", "_lock", "t_submit")

    def __init__(self, chunks, offsets, tempo, audio_seconds=0.0):
        self.chunks = chunks          # list of waveforms (one per slice)
        self.offsets = offsets
        self.tempo = tempo
        self.audio_seconds = audio_seconds
        self.t_submit = time.monotonic()   # stamped again by submit()
        self.done = threading.Event()
        self.segments = None
        self.error: Optional[str] = None
        # single-assignment accounting state, claimed atomically by EITHER
        # the handler ("abandoned", on its 503 timeout) or the dispatcher
        # ("delivered"/"failed"): without the claim, a timeout landing in
        # the same instant the dispatcher finishes could count one request
        # as both a 503 to the client and completed work in /stats
        self.resolution: Optional[str] = None
        self._lock = threading.Lock()

    def resolve(self, outcome: str) -> bool:
        """Claim the job's final accounting state; True iff this call won.
        The winner's outcome is what /stats records — transitions are
        None -> value exactly once."""
        with self._lock:
            if self.resolution is None:
                self.resolution = outcome
                return True
            return False


class BatchingDispatcher:
    """Single consumer thread: drains queued jobs, concatenates their chunk
    lists into ONE engine.infer call (the engine groups chunks by frame
    bucket and batches rows), then splits results back per job."""

    def __init__(self, engine, max_wait_ms: float = 25.0,
                 max_chunks_per_batch: Optional[int] = None,
                 max_queue_jobs: int = 256, fast_lane: bool = True):
        self.engine = engine
        self.max_wait = max_wait_ms / 1000.0
        self.max_chunks = max_chunks_per_batch or 4 * engine.max_batch_chunks
        # fast lane: a job arriving to an EMPTY queue dispatches immediately
        # instead of waiting max_wait_ms for batch-mates — a lone phrase
        # pays zero batching tax, while a concurrent burst still batches
        # (the burst's tail finds a non-empty queue)
        self.fast_lane = fast_lane
        # bounded: a stalled device + retrying clients must not grow an
        # unbounded backlog of waveforms (submit -> False -> HTTP 429)
        self.jobs: "queue.Queue[TranscribeJob]" = queue.Queue(max_queue_jobs)
        self.stats = {"requests": 0, "failed_requests": 0,
                      "abandoned_requests": 0, "batches": 0,
                      "audio_seconds": 0.0, "device_seconds": 0.0,
                      "max_jobs_per_batch": 0}
        # per-job (queue_wait, device) second pairs, last 2048: attributes
        # concurrent tail latency (is p99 queueing or chip time?) without
        # unbounded growth on long-lived servers
        from collections import deque
        self._job_times: "deque[tuple]" = deque(maxlen=2048)
        self._lock = threading.Lock()
        self._busy_since: Optional[float] = None
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def submit(self, job: TranscribeJob) -> bool:
        job.t_submit = time.monotonic()
        try:
            self.jobs.put_nowait(job)
            return True
        except queue.Full:
            return False

    def queue_depth(self) -> int:
        return self.jobs.qsize()

    def busy_seconds(self) -> float:
        """How long the current engine.infer call has been running (0 when
        idle). The liveness signal for /healthz: the axon-style tunnel can
        hang a device call indefinitely, and a hung dispatcher must not keep
        reporting a healthy service."""
        with self._lock:
            return 0.0 if self._busy_since is None \
                else time.monotonic() - self._busy_since

    def _drain(self) -> List[TranscribeJob]:
        batch = [self.jobs.get()]  # block for the first job
        if self.fast_lane and self.jobs.empty():
            return batch
        deadline = time.monotonic() + self.max_wait
        n_chunks = len(batch[0].chunks)
        while n_chunks < self.max_chunks:
            timeout = deadline - time.monotonic()
            if timeout <= 0:
                break
            try:
                job = self.jobs.get(timeout=timeout)
            except queue.Empty:
                break
            batch.append(job)
            n_chunks += len(job.chunks)
        return batch

    def _run(self) -> None:
        while True:
            batch = self._drain()
            # resolution only ever transitions None -> value, so a job
            # already claimed "abandoned" can be dropped without burning
            # device time on work nobody will receive
            dropped = [job for job in batch if job.resolution == "abandoned"]
            batch = [job for job in batch if job.resolution != "abandoned"]
            if dropped:
                with self._lock:
                    self.stats["abandoned_requests"] += len(dropped)
            if not batch:
                continue
            waveforms = [w for job in batch for w in job.chunks]
            t0 = time.monotonic()
            with self._lock:
                self._busy_since = t0
            try:
                all_segments = self.engine.infer(waveforms)
            except Exception as exc:  # surface to every caller in the batch
                failed = 0
                for job in batch:
                    job.error = f"{type(exc).__name__}: {exc}"
                    failed += job.resolve("failed")
                    job.done.set()
                with self._lock:
                    self._busy_since = None
                    self.stats["failed_requests"] += failed
                    self.stats["abandoned_requests"] += len(batch) - failed
                continue
            elapsed = time.monotonic() - t0
            for job in batch:
                # queue wait = submit -> the batch's device dispatch began
                self._job_times.append((t0 - job.t_submit, elapsed))
            pos = 0
            delivered = []
            for job in batch:
                job.segments = all_segments[pos:pos + len(job.chunks)]
                pos += len(job.chunks)
                # claim BEFORE done.set(): a handler that times out in this
                # same instant either wins the claim (503, we count
                # abandoned) or loses it (fields are final, it delivers)
                if job.resolve("delivered"):
                    delivered.append(job)
                job.done.set()
            with self._lock:
                self._busy_since = None
                self.stats["requests"] += len(delivered)
                self.stats["abandoned_requests"] += len(batch) - len(delivered)
                self.stats["batches"] += 1
                self.stats["device_seconds"] += elapsed
                # only completed work counts toward throughput: failed jobs
                # contributing audio_seconds would inflate RTF exactly when
                # the service is broken
                self.stats["audio_seconds"] += sum(
                    job.audio_seconds for job in delivered)
                self.stats["max_jobs_per_batch"] = max(
                    self.stats["max_jobs_per_batch"], len(batch))

    def snapshot(self) -> dict:
        with self._lock:
            stats = dict(self.stats)
            times = list(self._job_times)
        stats["rtf"] = (stats["audio_seconds"] / stats["device_seconds"]
                        if stats["device_seconds"] else 0.0)
        if times:
            # tail-latency attribution: is a slow request waiting in the
            # queue (dispatcher/batching) or on the device (engine.infer)?
            import numpy as _np
            waits = _np.array([w for w, _ in times]) * 1e3
            devs = _np.array([d for _, d in times]) * 1e3
            stats["job_queue_wait_ms"] = {
                "p50": round(float(_np.percentile(waits, 50)), 1),
                "p99": round(float(_np.percentile(waits, 99)), 1),
                "max": round(float(waits.max()), 1)}
            stats["job_device_ms"] = {
                "p50": round(float(_np.percentile(devs, 50)), 1),
                "p99": round(float(_np.percentile(devs, 99)), 1),
                "max": round(float(devs.max()), 1)}
        stats["wire"] = getattr(self.engine, "wire", None)
        if getattr(self.engine, "wire_decision", None) is not None:
            # live view of the TTL-cadence auto-wire policy (re-probed inside
            # engine.infer, so long-running servers track link flaps)
            stats["wire_decision"] = self.engine.wire_decision
        return stats


def make_server(engine, config: dict, addr: str, port: int,
                max_wait_ms: float = 25.0, infer_timeout_s: float = 600.0,
                fast_lane: bool = True, recycle_after: Optional[int] = None):
    """Build (but do not start) the HTTP server; returns (httpd, dispatcher).
    Split from serve() so tests can drive it in-process.

    ``recycle_after``: after this many completed requests /healthz reports
    ``{"status": "recycle"}`` with HTTP 503 so an orchestrator's liveness
    probe rotates the worker. The device tunnel client retains ~1 MB of
    live host memory per request below anything this repo controls
    (adjudicated in BENCH_NOTES "Serve-soak RSS slope": every repo layer is
    flat under gc+malloc_trim, bare run_bucket calls are not) — bounded
    worker lifetime is the production mitigation. In-flight requests
    finish normally; only the health signal flips."""
    from concurrent.futures import ThreadPoolExecutor
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from some_tpu.audio.wavio import load_wav
    from some_tpu.utils.midi_file import build_midi_file

    dispatcher = BatchingDispatcher(engine, max_wait_ms=max_wait_ms,
                                    fast_lane=fast_lane)
    sr = config["audio_sample_rate"]

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet by default
            pass

        def _reply(self, code: int, body: bytes, ctype: str) -> None:
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _reply_json(self, code: int, obj) -> None:
            self._reply(code, json.dumps(obj).encode(), "application/json")

        def do_GET(self):
            if self.path.startswith("/healthz"):
                busy = dispatcher.busy_seconds()
                stalled = busy > infer_timeout_s
                with dispatcher._lock:
                    # failed and abandoned requests made device calls too —
                    # the per-call tunnel retention this knob bounds accrues
                    # for them just the same (code-review r5), so a worker
                    # whose engine intermittently errors must still recycle
                    served = (dispatcher.stats["requests"]
                              + dispatcher.stats["failed_requests"]
                              + dispatcher.stats["abandoned_requests"])
                recycle = (not stalled and recycle_after is not None
                           and served >= recycle_after)
                status = ("stalled" if stalled
                          else "recycle" if recycle else "ok")
                self._reply_json(503 if status != "ok" else 200, {
                    "status": status,
                    "queue_depth": dispatcher.queue_depth(),
                    "requests": served,
                    "busy_seconds": round(busy, 1)})
            elif self.path.startswith("/stats"):
                self._reply_json(200, dispatcher.snapshot())
            else:
                self._reply_json(404, {"error": "unknown path"})

        def do_POST(self):
            if not self.path.startswith("/transcribe"):
                self._reply_json(404, {"error": "unknown path"})
                return
            from urllib.parse import parse_qs, urlparse
            params = parse_qs(urlparse(self.path).query)
            try:
                tempo = float(params.get("tempo", ["120"])[0])
                if not (0 < tempo < 10000):
                    raise ValueError
            except ValueError:
                self._reply_json(400, {"error": "tempo must be a positive "
                                                "number"})
                return
            as_json = params.get("format", [""])[0] == "json"
            try:
                length = int(self.headers.get("Content-Length", 0))
            except ValueError:
                self._reply_json(400, {"error": "bad Content-Length"})
                return
            if length < 0:
                # rfile.read(-1) would block until the client closes,
                # pinning a handler thread per malicious connection
                self._reply_json(400, {"error": "bad Content-Length"})
                return
            if length > MAX_BODY_BYTES:
                self._reply_json(413, {"error": "body larger than "
                                               f"{MAX_BODY_BYTES} bytes"})
                return
            body = self.rfile.read(length)
            try:
                waveform, _ = load_wav(io.BytesIO(body), sr=sr, mono=True)
            except Exception:
                self._reply_json(400, {"error": "unsupported or corrupt wav"})
                return
            duration = len(waveform) / sr
            if duration > MAX_DURATION_SEC:
                self._reply_json(413, {"error": "audio longer than 20 min"})
                return
            chunk_dicts = slice_waveform(waveform, sr)
            job = TranscribeJob([c["waveform"] for c in chunk_dicts],
                                [c["offset"] for c in chunk_dicts], tempo,
                                audio_seconds=duration)
            if not dispatcher.submit(job):
                self._reply_json(429, {"error": "server overloaded, "
                                                "retry later"})
                return
            if not job.done.wait(timeout=infer_timeout_s):
                # a hung device call holds the dispatcher thread forever;
                # tell the caller instead of hanging the connection with it
                if job.resolve("abandoned"):
                    self._reply_json(503,
                                     {"error": "inference backend stalled"})
                    return
                # lost the claim race: the dispatcher resolved this job in
                # the timeout gap; its fields are final (set before the
                # claim) — fall through and deliver the result after all
            if job.error is not None:
                self._reply_json(500, {"error": job.error})
            elif as_json:
                self._reply_json(
                    200, segments_to_json(job.offsets, job.segments,
                                          job.tempo))
            else:
                midi = build_midi_file(job.offsets, job.segments, tempo=tempo)
                self._reply(200, midi.serialize(), "audio/midi")

    class PooledHTTPServer(ThreadingHTTPServer):
        """Bounded handler pool instead of a thread per connection.

        ThreadingHTTPServer spawns a fresh thread for every request — under
        load spikes that is unbounded thread creation (the dispatcher queue
        bounds the WORK backlog; this bounds the SOCKET one), and the
        per-transient-thread multi-MB WAV buffers churn glibc arenas (the
        soak harness measured oscillating RSS, +154/+43/-80/+19 MB over
        consecutive 48-request bursts — fragmentation, not a leak: the
        sequential path is flat). A fixed pool reuses threads; cap arena
        count with MALLOC_ARENA_MAX=2 in the environment (set in the
        Dockerfile) to keep long-soak RSS tight."""

        pool_size = 32

        def __init__(self, *args, **kwargs):
            super().__init__(*args, **kwargs)
            self._pool = ThreadPoolExecutor(
                max_workers=self.pool_size,
                thread_name_prefix="serve-handler")

        def process_request(self, request, client_address):
            self._pool.submit(
                self.process_request_thread, request, client_address)

        def server_close(self):
            super().server_close()
            self._pool.shutdown(wait=False)

    httpd = PooledHTTPServer((addr, port), Handler)
    return httpd, dispatcher


@click.command(help="Batch-serving HTTP API: POST wav to /transcribe.")
@click.option("--model", required=True,
              type=click.Path(exists=True, dir_okay=False),
              help="Path to the checkpoint (config.yaml alongside).")
@click.option("--port", required=False, type=int, default=8572)
@click.option("--addr", required=False, default="0.0.0.0")
@click.option("--devices", required=False, type=int, default=1,
              help="Data-parallel serving over the first N devices.")
@click.option("--max-wait-ms", required=False, type=float, default=25.0,
              help="Micro-batching window: how long the dispatcher waits "
                   "to fill a batch after the first request arrives.")
@click.option("--max-batch-chunks", required=False, type=int, default=32)
@click.option("--infer-timeout-s", required=False, type=float, default=600.0,
              help="Per-request wait on the device pipeline before replying "
                   "503; also the /healthz stall threshold.")
@click.option("--wire-sr", required=False, type=int, default=None,
              help="Half-rate host->device audio wire (e.g. 22050): "
                   "equivalent STFT analysis at half the wire bytes and "
                   "mel FLOPs — see ARCHITECTURE.md.")
@click.option("--fast-lane/--no-fast-lane", default=True,
              help="Dispatch a request arriving to an empty queue "
                   "immediately (no max-wait-ms batching tax for lone "
                   "requests; concurrent bursts still batch).")
@click.option("--recycle-after", required=False, type=int, default=None,
              help="After N completed requests /healthz flips to 503 "
                   "{status: recycle} so an orchestrator rotates this "
                   "worker — bounds the tunnel client's measured ~1 MB/"
                   "request host-memory retention (BENCH_NOTES).")
@click.option("--prewarm", required=False, default=None, metavar="T1,T2,..",
              help="Frame buckets to compile BEFORE accepting traffic "
                   "(each warmed across the 1..8 row buckets), e.g. "
                   "'768,1024' for phrase-sized requests. Without it the "
                   "first request to hit a cold (rows, frames) program "
                   "pays its compile (measured 92 s on the TPU tunnel).")
def serve(model, port, addr, devices, max_wait_ms, max_batch_chunks,
          infer_timeout_s, wire_sr, fast_lane, recycle_after, prewarm):
    import yaml

    from some_tpu.inference.base_infer import build_inference

    model_path = pathlib.Path(model)
    with open(model_path.with_name("config.yaml"), "r", encoding="utf8") as f:
        config = yaml.safe_load(f)
    if wire_sr is not None:
        config["wire_sr"] = wire_sr
    kwargs = {"max_batch_chunks": max_batch_chunks}
    if devices > 1:
        import jax

        from some_tpu.parallel.mesh import make_mesh
        kwargs["mesh"] = make_mesh(jax.devices()[:devices])
    engine = build_inference(config, model_path, **kwargs)
    if prewarm:
        buckets = [int(b) for b in prewarm.split(",") if b.strip()]
        n = engine.prewarm(buckets)
        print(f"| prewarmed {n} bucket programs ({prewarm} frames x 1..8 rows)")
    httpd, _ = make_server(engine, config, addr, port,
                           max_wait_ms=max_wait_ms,
                           infer_timeout_s=infer_timeout_s,
                           fast_lane=fast_lane,
                           recycle_after=recycle_after)
    print(f"| serving on http://{addr}:{port} "
          f"(POST /transcribe, GET /healthz, /stats)")
    httpd.serve_forever()


if __name__ == "__main__":
    serve()

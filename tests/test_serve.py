"""Batch-serving HTTP API: wav in -> MIDI out, micro-batched across
concurrent requests (serve.py; beyond the reference's one-at-a-time webui)."""
import io
import json
import threading
import urllib.request

import numpy as np
import pytest

from tests.test_inference import TINY_MODEL_CONFIG, synth


@pytest.fixture(scope="module")
def server():
    import jax
    import jax.numpy as jnp

    from serve import make_server
    from some_tpu.inference.me_infer import MIDIExtractionInference
    from some_tpu.nn.model import build_midi_extractor

    config = dict(TINY_MODEL_CONFIG, transfer_dtype="float32")
    model = build_midi_extractor(config)
    variables = model.init(jax.random.PRNGKey(7),
                           np.zeros((1, 64, 80), np.float32),
                           mask=np.ones((1, 64), bool))
    engine = MIDIExtractionInference.from_variables(
        config, variables, dtype=jnp.float32)
    httpd, dispatcher = make_server(engine, config, "127.0.0.1", 0,
                                    max_wait_ms=60.0)
    port = httpd.server_address[1]
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{port}", engine, config, dispatcher
    httpd.shutdown()


def _wav_bytes(wave, sr):
    from some_tpu.audio.wavio import save_wav
    import pathlib
    import tempfile

    path = pathlib.Path(tempfile.mkdtemp()) / "req.wav"
    save_wav(path, wave, sr)
    return path.read_bytes()


def _post(url, body, timeout=300):
    req = urllib.request.Request(url, data=body, method="POST")
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return resp.status, resp.headers.get("Content-Type"), resp.read()


def test_healthz_and_stats(server):
    base, *_ = server
    with urllib.request.urlopen(base + "/healthz", timeout=60) as resp:
        health = json.loads(resp.read())
    assert health["status"] == "ok"
    with urllib.request.urlopen(base + "/stats", timeout=60) as resp:
        stats = json.loads(resp.read())
    assert {"requests", "batches", "rtf"} <= set(stats)


def test_transcribe_matches_direct_engine(server, tmp_path):
    """The served MIDI must be byte-identical to driving the engine +
    assembler directly on the same audio."""
    base, engine, config, _ = server
    sr = config["audio_sample_rate"]
    wave = np.concatenate([synth(1.2, 440.0, seed=5),
                           np.zeros(sr, np.float32),
                           synth(1.0, 523.25, seed=6)])
    body = _wav_bytes(wave, sr)

    status, ctype, midi_bytes = _post(base + "/transcribe?tempo=120", body)
    assert status == 200 and ctype == "audio/midi"
    assert midi_bytes[:4] == b"MThd"

    from some_tpu.audio.slicer import SilenceSlicer
    from some_tpu.audio.wavio import load_wav
    from some_tpu.utils.midi_file import build_midi_file

    loaded, _ = load_wav(io.BytesIO(body), sr=sr, mono=True)
    chunks = SilenceSlicer(sr=sr, max_sil_kept=1000).slice(loaded)
    segments = engine.infer([c["waveform"] for c in chunks])
    want = build_midi_file([c["offset"] for c in chunks], segments,
                           tempo=120).serialize()
    assert midi_bytes == want


def test_transcribe_json_format(server):
    base, _, config, _ = server
    sr = config["audio_sample_rate"]
    body = _wav_bytes(synth(0.8, 330.0, seed=9), sr)
    status, ctype, payload = _post(
        base + "/transcribe?tempo=90&format=json", body)
    assert status == 200 and ctype == "application/json"
    data = json.loads(payload)
    assert data["tempo"] == 90.0
    assert len(data["segments"]) >= 1
    seg = data["segments"][0]
    assert len(seg["note_midi"]) == len(seg["note_dur_sec"]) \
        == len(seg["note_rest"])


def test_concurrent_requests_batch_and_agree(server):
    """Concurrent callers are micro-batched (the dispatcher sees >1 job in
    one drain) and each still gets exactly its own song's notes."""
    base, engine, config, dispatcher = server
    sr = config["audio_sample_rate"]
    waves = [synth(0.9, 300 + 60 * i, seed=20 + i) for i in range(4)]
    bodies = [_wav_bytes(w, sr) for w in waves]
    results = [None] * 4

    def call(i):
        results[i] = _post(base + "/transcribe?tempo=120", bodies[i])

    threads = [threading.Thread(target=call, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    from some_tpu.utils.midi_file import build_midi_file

    from some_tpu.audio.slicer import SilenceSlicer
    from some_tpu.audio.wavio import load_wav

    for i, (status, ctype, midi_bytes) in enumerate(results):
        assert status == 200, i
        loaded, _ = load_wav(io.BytesIO(bodies[i]), sr=sr, mono=True)
        chunks = SilenceSlicer(sr=sr, max_sil_kept=1000).slice(loaded)
        segments = engine.infer([c["waveform"] for c in chunks])
        want = build_midi_file([c["offset"] for c in chunks], segments,
                               tempo=120).serialize()
        assert midi_bytes == want, f"caller {i} got someone else's notes"

    # batching actually happened at least once across the suite (60 ms
    # window, 4 concurrent posts — the dispatcher drains >= 2 jobs together)
    assert dispatcher.snapshot()["max_jobs_per_batch"] >= 2


def test_bad_wav_is_400(server):
    base, *_ = server
    req = urllib.request.Request(base + "/transcribe?tempo=120",
                                 data=b"definitely not a wav", method="POST")
    try:
        urllib.request.urlopen(req, timeout=60)
        assert False, "expected HTTP 400"
    except urllib.error.HTTPError as err:
        assert err.code == 400
        assert b"corrupt" in err.read()


@pytest.mark.parametrize("tempo", ["0", "-5", "abc", "nan"])
def test_bad_tempo_is_400(server, tempo):
    """Invalid tempo values must produce a clean 400, not an unhandled
    ZeroDivisionError/ValueError that drops the connection."""
    base, _, config, _ = server
    body = _wav_bytes(synth(0.3, 440.0, seed=1), config["audio_sample_rate"])
    req = urllib.request.Request(base + f"/transcribe?tempo={tempo}",
                                 data=body, method="POST")
    try:
        urllib.request.urlopen(req, timeout=60)
        assert False, "expected HTTP 400"
    except urllib.error.HTTPError as err:
        assert err.code == 400
        assert b"tempo" in err.read()


def test_stalled_backend_times_out_not_hangs():
    """A hung device call (the axon tunnel's documented failure mode) must
    turn into a 503 for the caller and a 'stalled' /healthz — not an
    indefinitely blocked connection behind a lying health check."""
    from serve import make_server

    release = threading.Event()

    class HangingEngine:
        max_batch_chunks = 8

        def infer(self, waveforms):
            release.wait(timeout=30)
            return [{"note_midi": np.zeros(0), "note_dur": np.zeros(0),
                     "note_rest": np.zeros(0, bool)} for _ in waveforms]

    config = dict(TINY_MODEL_CONFIG)
    httpd, dispatcher = make_server(HangingEngine(), config, "127.0.0.1", 0,
                                    max_wait_ms=1.0, infer_timeout_s=0.5)
    port = httpd.server_address[1]
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{port}"
    try:
        body = _wav_bytes(synth(0.3, 440.0, seed=2),
                          config["audio_sample_rate"])
        req = urllib.request.Request(base + "/transcribe", data=body,
                                     method="POST")
        try:
            urllib.request.urlopen(req, timeout=60)
            assert False, "expected HTTP 503"
        except urllib.error.HTTPError as err:
            assert err.code == 503
            assert b"stalled" in err.read()
        # the dispatcher is still inside the hung infer -> healthz degrades
        # once busy_seconds crosses the stall threshold; on a contended
        # core the dispatcher thread may enter the hung call late, so poll
        deadline = __import__("time").monotonic() + 20
        while True:
            try:
                urllib.request.urlopen(base + "/healthz", timeout=60)
                assert __import__("time").monotonic() < deadline, \
                    "healthz never reported the stall"
                __import__("time").sleep(0.1)
            except urllib.error.HTTPError as err:
                assert err.code == 503
                health = json.loads(err.read())
                break
        assert health["status"] == "stalled"
        assert health["busy_seconds"] > 0
        # when the hung call finally returns, the 503'd job must be counted
        # abandoned — not as completed work with healthy throughput
        release.set()
        deadline = __import__("time").monotonic() + 30
        while __import__("time").monotonic() < deadline:
            stats = dispatcher.snapshot()
            if stats["abandoned_requests"]:
                break
            __import__("time").sleep(0.05)
        assert stats["abandoned_requests"] == 1
        assert stats["requests"] == 0 and stats["audio_seconds"] == 0.0
    finally:
        release.set()
        httpd.shutdown()


def test_full_queue_is_429():
    """A stalled device plus retrying clients must bound the backlog: once
    the job queue is full, submit() refuses and the handler replies 429."""
    from serve import BatchingDispatcher, TranscribeJob

    release = threading.Event()

    class HangingEngine:
        max_batch_chunks = 8

        def infer(self, waveforms):
            release.wait(timeout=30)
            return [{"note_midi": np.zeros(0), "note_dur": np.zeros(0),
                     "note_rest": np.zeros(0, bool)} for _ in waveforms]

    dispatcher = BatchingDispatcher(HangingEngine(), max_wait_ms=1.0,
                                    max_queue_jobs=1)
    try:
        wave = np.zeros(16, np.float32)
        first = TranscribeJob([wave], [0.0], 120.0)
        assert dispatcher.submit(first)
        # wait until the dispatcher thread has drained it into the hung
        # infer, leaving the queue empty again
        deadline = __import__("time").monotonic() + 10
        while dispatcher.queue_depth() and \
                __import__("time").monotonic() < deadline:
            __import__("time").sleep(0.01)
        assert dispatcher.submit(TranscribeJob([wave], [0.0], 120.0))
        assert not dispatcher.submit(TranscribeJob([wave], [0.0], 120.0)), \
            "queue over capacity must refuse"
    finally:
        release.set()


def test_negative_content_length_is_400(server):
    """Content-Length: -1 must be rejected up front — rfile.read(-1) would
    block until the client closes, pinning a handler thread forever."""
    import socket

    base, *_ = server
    host, port = base.removeprefix("http://").split(":")
    with socket.create_connection((host, int(port)), timeout=30) as sock:
        sock.sendall(b"POST /transcribe?tempo=120 HTTP/1.1\r\n"
                     b"Host: test\r\nContent-Length: -1\r\n\r\n")
        reply = sock.recv(4096)
    assert b"400" in reply.split(b"\r\n", 1)[0]


def test_oversize_body_is_413_before_read(server):
    import socket

    base, *_ = server
    host, port = base.removeprefix("http://").split(":")
    with socket.create_connection((host, int(port)), timeout=30) as sock:
        sock.sendall(b"POST /transcribe?tempo=120 HTTP/1.1\r\n"
                     b"Host: test\r\nContent-Length: 999999999999\r\n\r\n")
        # no body sent: the server must answer from the header alone
        reply = sock.recv(4096)
    assert b"413" in reply.split(b"\r\n", 1)[0]


def test_failed_jobs_do_not_inflate_rtf():
    """audio_seconds only counts COMPLETED work: a failing backend must not
    report healthy throughput while returning 500s."""
    from serve import make_server

    class FailingEngine:
        max_batch_chunks = 8

        def infer(self, waveforms):
            raise RuntimeError("device on fire")

    config = dict(TINY_MODEL_CONFIG)
    httpd, dispatcher = make_server(FailingEngine(), config, "127.0.0.1", 0,
                                    max_wait_ms=1.0)
    port = httpd.server_address[1]
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{port}"
    try:
        body = _wav_bytes(synth(0.4, 440.0, seed=3),
                          config["audio_sample_rate"])
        req = urllib.request.Request(base + "/transcribe", data=body,
                                     method="POST")
        try:
            urllib.request.urlopen(req, timeout=60)
            assert False, "expected HTTP 500"
        except urllib.error.HTTPError as err:
            assert err.code == 500
        stats = dispatcher.snapshot()
        assert stats["failed_requests"] == 1
        assert stats["audio_seconds"] == 0.0 and stats["rtf"] == 0.0
    finally:
        httpd.shutdown()


def test_job_resolution_claim_is_atomic():
    """The handler's 503 path and the dispatcher's delivery path claim a
    job's accounting state atomically: under many concurrent attempts,
    exactly one wins, the state never changes after the first claim, and
    both sides can trust the winner for stats (regression for the
    timeout/delivery stats race)."""
    import threading as th

    from serve import TranscribeJob

    for trial in range(200):
        job = TranscribeJob([], [], 120.0)
        winners = []
        barrier = th.Barrier(3)

        def claim(outcome):
            barrier.wait()
            if job.resolve(outcome):
                winners.append(outcome)

        threads = [th.Thread(target=claim, args=("abandoned",)),
                   th.Thread(target=claim, args=("delivered",)),
                   th.Thread(target=claim, args=("failed",))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert len(winners) == 1
        assert job.resolution == winners[0]
        # late claims never overwrite the winner
        assert not job.resolve("delivered")
        assert job.resolution == winners[0]


def test_fast_lane_skips_batching_wait():
    """A lone request arriving to an empty queue must dispatch immediately
    (no max_wait_ms tax); with the fast lane off it waits the window."""
    import time

    from serve import BatchingDispatcher, TranscribeJob

    class InstantEngine:
        max_batch_chunks = 8

        def infer(self, waveforms):
            return [{"note_midi": np.zeros(0), "note_dur": np.zeros(0),
                     "note_rest": np.zeros(0, bool)} for _ in waveforms]

    wave = np.zeros(16, np.float32)

    fast = BatchingDispatcher(InstantEngine(), max_wait_ms=1500.0,
                              fast_lane=True)
    job = TranscribeJob([wave], [0.0], 120.0)
    t0 = time.monotonic()
    assert fast.submit(job)
    assert job.done.wait(timeout=10)
    assert time.monotonic() - t0 < 1.0, \
        "fast lane must not wait the 1.5 s batching window"

    slow = BatchingDispatcher(InstantEngine(), max_wait_ms=400.0,
                              fast_lane=False)
    job2 = TranscribeJob([wave], [0.0], 120.0)
    t0 = time.monotonic()
    assert slow.submit(job2)
    assert job2.done.wait(timeout=10)
    assert time.monotonic() - t0 >= 0.35, \
        "without the fast lane a lone job waits out max_wait_ms"


def test_fast_lane_still_batches_bursts():
    """Concurrent submissions behind a busy engine must still ride one
    batch even with the fast lane on (the queue is non-empty when the
    dispatcher returns to drain)."""
    import time

    release = threading.Event()
    calls = []

    class GatedEngine:
        max_batch_chunks = 8

        def infer(self, waveforms):
            calls.append(len(waveforms))
            release.wait(timeout=30)
            return [{"note_midi": np.zeros(0), "note_dur": np.zeros(0),
                     "note_rest": np.zeros(0, bool)} for _ in waveforms]

    from serve import BatchingDispatcher, TranscribeJob
    dispatcher = BatchingDispatcher(GatedEngine(), max_wait_ms=25.0,
                                    fast_lane=True)
    wave = np.zeros(16, np.float32)
    first = TranscribeJob([wave], [0.0], 120.0)
    assert dispatcher.submit(first)  # fast-laned into the gated infer
    deadline = time.monotonic() + 10
    while not calls and time.monotonic() < deadline:
        time.sleep(0.01)
    burst = [TranscribeJob([wave], [0.0], 120.0) for _ in range(3)]
    for job in burst:
        assert dispatcher.submit(job)
    release.set()
    for job in burst:
        assert job.done.wait(timeout=10)
    assert first.done.wait(timeout=10)
    assert calls[0] == 1 and 3 in calls, \
        f"burst behind a busy engine should batch: calls={calls}"


def test_recycle_after_flips_healthz():
    """--recycle-after bounds worker lifetime: the tunnel client retains
    ~1 MB/request of live host memory below anything this repo controls
    (BENCH_NOTES 'Serve-soak RSS slope'), so after N completed requests
    /healthz must report 503 {status: recycle} for the orchestrator while
    transcription keeps working (drain, don't drop)."""
    from serve import make_server

    class StubEngine:
        max_batch_chunks = 8

        def infer(self, waveforms):
            return [{"note_midi": np.zeros(0), "note_dur": np.zeros(0),
                     "note_rest": np.zeros(0, bool)} for _ in waveforms]

    config = dict(TINY_MODEL_CONFIG)
    httpd, dispatcher = make_server(StubEngine(), config, "127.0.0.1", 0,
                                    max_wait_ms=1.0, recycle_after=2)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port}"
    try:
        body = _wav_bytes(synth(0.3, 440.0, seed=3),
                          config["audio_sample_rate"])
        status, _, _ = _post(base + "/transcribe?tempo=120", body)
        assert status == 200
        with urllib.request.urlopen(base + "/healthz", timeout=60) as resp:
            assert json.loads(resp.read())["status"] == "ok"
        status, _, _ = _post(base + "/transcribe?tempo=120", body)
        assert status == 200
        try:
            urllib.request.urlopen(base + "/healthz", timeout=60)
            assert False, "expected HTTP 503 recycle"
        except urllib.error.HTTPError as err:
            assert err.code == 503
            health = json.loads(err.read())
        assert health["status"] == "recycle"
        assert health["requests"] == 2
        # requests keep succeeding while the orchestrator drains the worker
        status, _, _ = _post(base + "/transcribe?tempo=120", body)
        assert status == 200
    finally:
        httpd.shutdown()


def test_recycle_counts_failed_requests():
    """The per-call tunnel retention accrues for FAILED requests too (the
    device call happened); a worker whose engine intermittently raises must
    still hit its recycle threshold (code-review r5)."""
    from serve import make_server

    class FailingEngine:
        max_batch_chunks = 8

        def infer(self, waveforms):
            raise RuntimeError("tunnel reset")

    config = dict(TINY_MODEL_CONFIG)
    httpd, dispatcher = make_server(FailingEngine(), config, "127.0.0.1", 0,
                                    max_wait_ms=1.0, recycle_after=2)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port}"
    try:
        body = _wav_bytes(synth(0.3, 440.0, seed=4),
                          config["audio_sample_rate"])
        for _ in range(2):
            try:
                _post(base + "/transcribe?tempo=120", body)
                assert False, "expected HTTP 500"
            except urllib.error.HTTPError as err:
                assert err.code == 500
        try:
            urllib.request.urlopen(base + "/healthz", timeout=60)
            assert False, "expected 503 recycle despite zero successes"
        except urllib.error.HTTPError as err:
            assert err.code == 503
            assert json.loads(err.read())["status"] == "recycle"
    finally:
        httpd.shutdown()

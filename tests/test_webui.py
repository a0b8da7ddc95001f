"""Drive the stdlib-fallback web UI end-to-end over HTTP."""
import io
import pathlib
import sys
import threading
import urllib.request
import uuid

import numpy as np
import pytest
import yaml

sys.path.insert(0, "/root/repo")

from tests.test_inference import TINY_MODEL_CONFIG, synth  # noqa: E402


@pytest.fixture(scope="module")
def work_dir(tmp_path_factory):
    import jax

    from some_tpu.nn.model import build_midi_extractor
    from some_tpu.training.checkpoint import save_checkpoint

    wd = tmp_path_factory.mktemp("webui_work")
    config = dict(TINY_MODEL_CONFIG)
    model = build_midi_extractor(config)
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, 32, 80), np.float32))
    save_checkpoint(wd, 100, variables["params"], variables.get("batch_stats"))
    yaml.safe_dump(config, open(wd / "config.yaml", "w"))
    return wd


def _multipart(fields: dict, file_field: str, file_bytes: bytes):
    boundary = uuid.uuid4().hex
    body = io.BytesIO()
    for name, value in fields.items():
        body.write(f"--{boundary}\r\nContent-Disposition: form-data; "
                   f"name=\"{name}\"\r\n\r\n{value}\r\n".encode())
    body.write(f"--{boundary}\r\nContent-Disposition: form-data; "
               f"name=\"{file_field}\"; filename=\"a.wav\"\r\n"
               f"Content-Type: audio/wav\r\n\r\n".encode())
    body.write(file_bytes)
    body.write(f"\r\n--{boundary}--\r\n".encode())
    return body.getvalue(), boundary


def test_stdlib_webui_roundtrip(work_dir, tmp_path):
    import webui as webui_mod
    from some_tpu.audio.wavio import save_wav
    from some_tpu.utils.midi_file import MidiFile

    webui_mod._work_dir = pathlib.Path(work_dir)
    choices = [p.relative_to(work_dir).as_posix()
               for p in pathlib.Path(work_dir).rglob("*.ckpt")]
    assert choices

    # bind port 0 to avoid collisions; grab the real port from the server
    import http.server
    server_holder = {}
    orig_http_server = http.server.HTTPServer

    def launch():
        # reuse the module's handler wiring but with port 0
        try:
            webui_mod._launch_stdlib(choices, 0, "127.0.0.1")
        except Exception:
            pass

    # patch serve_forever to capture the server instance
    class CapturingServer(orig_http_server):
        def serve_forever(self, *a, **k):
            server_holder["server"] = self
            super().serve_forever(*a, **k)

    http.server.HTTPServer = CapturingServer
    webui_mod.__dict__["HTTPServer"] = CapturingServer  # in case of rebind
    try:
        thread = threading.Thread(target=launch, daemon=True)
        thread.start()
        import time
        for _ in range(100):
            if "server" in server_holder:
                break
            time.sleep(0.1)
        assert "server" in server_holder, "server did not start"
        port = server_holder["server"].server_address[1]

        # GET: form renders with the checkpoint choice
        page = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/", timeout=30).read().decode()
        assert choices[0] in page

        # POST: upload a wav, get a MIDI back
        wav_path = tmp_path / "in.wav"
        save_wav(wav_path, synth(2.0, 440), 44100)
        body, boundary = _multipart(
            {"model": choices[0], "tempo": "120"}, "audio", wav_path.read_bytes())
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/", data=body, method="POST",
            headers={"Content-Type": f"multipart/form-data; boundary={boundary}"})
        resp = urllib.request.urlopen(req, timeout=300)
        data = resp.read()
        assert resp.headers["Content-Type"] == "audio/midi"
        out = tmp_path / "out.mid"
        out.write_bytes(data)
        mf = MidiFile.load(out)
        assert mf.ticks_per_beat == 480
    finally:
        http.server.HTTPServer = orig_http_server
        if "server" in server_holder:
            server_holder["server"].shutdown()

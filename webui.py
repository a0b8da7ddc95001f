"""Web UI for interactive transcription (reference counterpart: webui.py).

Uses gradio when available; otherwise serves a minimal stdlib HTTP UI with
the same capabilities (checkpoint dropdown over work_dir, audio upload, tempo
field, RTF report, MIDI download) so the surface exists without extra
dependencies.
"""
from __future__ import annotations

import io
import pathlib
import time
from typing import Dict, Tuple

import click

_work_dir: pathlib.Path = None
_devices: int = 1
_engines: Dict[str, Tuple[object, dict]] = {}


def _get_engine(model_rel_path: str):
    import yaml

    from some_tpu.inference.base_infer import build_inference

    if model_rel_path not in _engines:
        model_path = _work_dir / model_rel_path
        with open(model_path.with_name("config.yaml"), "r", encoding="utf8") as f:
            config = yaml.safe_load(f)
        kwargs = {}
        if _devices > 1:
            import jax

            from some_tpu.parallel.mesh import make_mesh
            kwargs["mesh"] = make_mesh(jax.devices()[:_devices])
        _engines[model_rel_path] = (
            build_inference(config, model_path, **kwargs), config)
    return _engines[model_rel_path]


def transcribe(model_rel_path: str, audio_path: str, tempo: float):
    """Shared handler: returns (midi_path | None, status message)."""
    from some_tpu.audio.wavio import load_wav
    from some_tpu.inference.pipeline import (MAX_DURATION_SEC,
                                             transcribe_waveform)

    if not model_rel_path or not audio_path or tempo is None:
        return None, "Error: required inputs not specified."
    engine, config = _get_engine(model_rel_path)
    try:
        waveform, _ = load_wav(audio_path, sr=config["audio_sample_rate"], mono=True)
    except Exception:
        return None, f"Error: unsupported or corrupt file: {audio_path}"
    total_duration = len(waveform) / config["audio_sample_rate"]
    if total_duration > MAX_DURATION_SEC:
        return None, "Error: the input audio is too long (>= 20 minutes)."

    start = time.time()
    midi_file = transcribe_waveform(engine, waveform,
                                    config["audio_sample_rate"], tempo=tempo)
    infer_time = time.time() - start
    rtf = infer_time / max(total_duration, 1e-9)
    print(f"RTF: {rtf}")

    out_path = pathlib.Path(audio_path).with_suffix(".mid")
    midi_file.save(out_path)
    return out_path, f"Cost {round(infer_time, 2)} s, RTF: {round(rtf, 3)}"


def _launch_gradio(choices, port, addr):
    import gradio as gr

    iface = gr.Interface(
        title="SOME-TPU: Singing-Oriented MIDI Extractor",
        description="Submit an audio file and download the extracted MIDI file.",
        fn=transcribe,
        inputs=[
            gr.components.Dropdown(label="Model Checkpoint", choices=choices,
                                   value=choices[0], multiselect=False),
            gr.components.Audio(label="Input Audio File", type="filepath"),
            gr.components.Number(label="Tempo Value", minimum=20, maximum=200,
                                 value=120),
        ],
        outputs=[
            gr.components.File(label="Output MIDI File", file_types=[".mid"]),
            gr.components.Label(label="Inference Statistics"),
        ],
    )
    iface.launch(server_port=port, server_name=addr)


def _launch_stdlib(choices, port, addr):
    """Dependency-free fallback UI."""
    import email
    import email.policy
    import tempfile
    from http.server import BaseHTTPRequestHandler, HTTPServer

    page = """<!doctype html><title>SOME-TPU</title>
<h2>SOME-TPU: Singing-Oriented MIDI Extractor</h2>
<form method=post enctype=multipart/form-data>
<p>Checkpoint: <select name=model>{options}</select></p>
<p>Audio (wav): <input type=file name=audio></p>
<p>Tempo: <input type=number name=tempo value=120 min=20 max=200></p>
<p><input type=submit value=Transcribe></p></form>
<p>{status}</p>"""

    class Handler(BaseHTTPRequestHandler):
        def _render(self, status=""):
            options = "".join(f"<option>{c}</option>" for c in choices)
            body = page.format(options=options, status=status).encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            self._render()

        def do_POST(self):
            length = int(self.headers["Content-Length"])
            raw = (b"Content-Type: " + self.headers["Content-Type"].encode()
                   + b"\r\n\r\n" + self.rfile.read(length))
            msg = email.message_from_bytes(raw, policy=email.policy.HTTP)
            fields = {}
            audio_bytes = None
            for part in msg.iter_parts():
                name = part.get_param("name", header="content-disposition")
                if name == "audio":
                    audio_bytes = part.get_payload(decode=True)
                else:
                    fields[name] = part.get_payload(decode=True).decode().strip()
            if not audio_bytes:
                return self._render("Error: no audio uploaded.")
            with tempfile.NamedTemporaryFile(suffix=".wav", delete=False) as f:
                f.write(audio_bytes)
                wav_path = f.name
            midi_path, status = transcribe(
                fields.get("model"), wav_path, float(fields.get("tempo", 120)))
            if midi_path is None:
                return self._render(status)
            data = pathlib.Path(midi_path).read_bytes()
            self.send_response(200)
            self.send_header("Content-Type", "audio/midi")
            self.send_header("Content-Disposition",
                             'attachment; filename="output.mid"')
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

    server = HTTPServer((addr or "0.0.0.0", port), Handler)
    print(f"| serving fallback web UI on {addr or '0.0.0.0'}:{port}")
    server.serve_forever()


@click.command(help="Launch the web UI for inference")
@click.option("--port", type=int, default=7860, help="Server port")
@click.option("--addr", type=str, required=False, help="Server address")
@click.option("--work_dir", type=str, required=False,
              help="Directory to read the experiments")
@click.option("--devices", type=int, default=1,
              help="Data-parallel serving over N local devices")
def webui(port, work_dir, addr, devices):
    global _work_dir, _devices
    _devices = devices
    if work_dir is None:
        work_dir = pathlib.Path(__file__).with_name("experiments")
    else:
        work_dir = pathlib.Path(work_dir)
    assert work_dir.is_dir(), f"{work_dir} is not a directory."
    _work_dir = work_dir
    choices = [p.relative_to(work_dir).as_posix() for p in work_dir.rglob("*.ckpt")]
    if not choices:
        raise FileNotFoundError(f"No checkpoints found in {work_dir}.")
    try:
        _launch_gradio(choices, port, addr)
    except ImportError:
        _launch_stdlib(choices, port, addr)


if __name__ == "__main__":
    webui()

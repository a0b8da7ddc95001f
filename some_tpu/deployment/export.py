"""Deployment export: fused waveform->notes graph as serialized StableHLO.

The reference exports a traced ONNX module with dynamic n_samples/n_notes
axes (reference: export.py:52-106, deployment/me_onnx_module.py:9-39). The
TPU-native artifact is ``jax.export``-serialized StableHLO: portable across
JAX/XLA runtimes (TPU/CPU/GPU, IREE, PJRT plugins), forward-compatible, and
containing the *whole* pipeline — log-mel, conformer, framewise decode, note
aggregation — as one program.

Shape policy: XLA wants static shapes, so the artifact holds one exported
program per frame bucket (the same geometric grid the inference engine uses)
plus a JSON manifest; ``load_exported`` reconstructs a callable that routes
to the right bucket. Note counts are static [T]-shaped outputs with an
``n_notes`` scalar — the dynamic-axis trick the ONNX export needed
(export.py:94-99) becomes a host-side slice.
"""
from __future__ import annotations

import json
import pathlib
from typing import Dict, Sequence

import numpy as np


class DeploymentExporter:
    """Wraps an inference engine's jitted device pipeline for export."""

    infer_cls = None  # set by subclasses

    def __init__(self, config: dict, model_path, dtype=None):
        engine_kwargs = {} if dtype is None else {"dtype": dtype}
        # the artifact's input contract is NATIVE-RATE float32 audio
        # (portable, bit-exact — see module docstring); pin the wire
        # regardless of the serving defaults so the traced pipeline has no
        # packed decode AND no half-rate decimation (wire_sr is a live-
        # serving knob — the host-side FIR cannot ride inside the artifact,
        # so exporting a decimated-input program would silently analyze
        # native audio at the wrong rate)
        config = dict(config, transfer_dtype="float32", wire_sr=None)
        self.engine = self.infer_cls(config=config, model_path=model_path,
                                     **engine_kwargs)
        self.config = config

    def export(self, out_dir: pathlib.Path | str,
               buckets: Sequence[int] = (256, 512, 1024, 2048, 4096),
               platforms: Sequence[str] = ("tpu", "cpu")) -> pathlib.Path:
        import jax
        from jax import export as jexport

        out_dir = pathlib.Path(out_dir)
        out_dir.mkdir(parents=True, exist_ok=True)
        hop = self.engine.hop
        manifest: Dict[str, dict] = {}
        from some_tpu.ops.dispatch import portable_mode

        engine = self.engine
        variables = jax.device_put(engine.variables)

        def pipeline(audio, mask):
            # weights are intentionally embedded in the deployment artifact
            return engine._device_pipeline(variables, audio, mask)

        for bucket in buckets:
            n_samples = bucket * hop - 1
            fn = jax.jit(pipeline)
            # portable_mode: multi-platform artifacts must avoid Pallas
            # kernels (they only lower for the TPU target)
            with portable_mode():
                exported = jexport.export(fn, platforms=list(platforms))(
                    jax.ShapeDtypeStruct((1, n_samples), np.float32),
                    jax.ShapeDtypeStruct((1, bucket), np.bool_),
                )
            blob = exported.serialize()
            name = f"bucket_{bucket}.stablehlo"
            (out_dir / name).write_bytes(blob)
            manifest[str(bucket)] = {
                "file": name, "n_samples": n_samples, "frames": bucket,
            }
        (out_dir / "manifest.json").write_text(json.dumps({
            "format": "some-tpu-stablehlo-v1",
            "task_cls": self.config.get("task_cls"),
            "sample_rate": self.config["audio_sample_rate"],
            "hop_size": hop,
            "timestep": self.engine.timestep,
            "buckets": manifest,
        }, indent=2))
        return out_dir


class MIDIExtractionExporter(DeploymentExporter):
    @property
    def infer_cls(self):
        from some_tpu.inference.me_infer import MIDIExtractionInference
        return MIDIExtractionInference


class QuantizedMIDIExtractionExporter(DeploymentExporter):
    @property
    def infer_cls(self):
        from some_tpu.inference.me_quant_infer import QuantizedMIDIExtractionInference
        return QuantizedMIDIExtractionInference


class _ExportedPipeline:
    def __init__(self, out_dir: pathlib.Path, manifest: dict):
        from jax import export as jexport

        self.manifest = manifest
        self.timestep = manifest["timestep"]
        self._programs = {}
        for bucket, meta in manifest["buckets"].items():
            blob = (out_dir / meta["file"]).read_bytes()
            self._programs[int(bucket)] = jexport.deserialize(blob)

    def __call__(self, waveform: np.ndarray) -> Dict[str, np.ndarray]:
        """[n_samples] float32 -> sliced note dict."""
        hop = self.manifest["hop_size"]
        n_frames = len(waveform) // hop + 1
        bucket = min((b for b in sorted(self._programs) if b >= n_frames),
                     default=None)
        if bucket is None:
            raise ValueError(f"waveform needs {n_frames} frames; largest "
                             f"exported bucket is {max(self._programs)}")
        n_samples = bucket * hop - 1
        audio = np.zeros((1, n_samples), np.float32)
        audio[0, :len(waveform)] = waveform[:n_samples]
        mask = np.zeros((1, bucket), bool)
        mask[0, :n_frames] = True
        out = self._programs[bucket].call(audio, mask)
        out = {k: np.asarray(v) for k, v in out.items()}
        n = int(out["n_notes"][0])
        return {
            "note_midi": out["note_midi"][0, :n],
            "note_dur": out["note_dur"][0, :n].astype(np.float64) * self.timestep,
            "note_rest": out["note_rest"][0, :n],
        }


def load_exported(out_dir: pathlib.Path | str) -> _ExportedPipeline:
    out_dir = pathlib.Path(out_dir)
    manifest = json.loads((out_dir / "manifest.json").read_text())
    return _ExportedPipeline(out_dir, manifest)

"""Host->device audio wire formats for the inference engine.

The serving bottleneck off-chip is link bandwidth (BENCH_NOTES.md: a 40 MB/s
dev tunnel caps ANY implementation near ~470x real time on float32 audio).
Three formats, selected by the ``transfer_dtype`` config key:

  * ``float32`` — 4 B/sample, bit-exact for arbitrary float sources.
  * ``int16`` (default) — 2 B/sample; exactly reproduces 16-bit-PCM-sourced
    waveforms after the on-device /32768 (virtually all real inputs).
  * ``mulaw8`` — 1 B/sample, mu-law companded (mu=255, the G.711 curve).
    LOSSY (~38 dB SNR) but the log-mel frontend is log-domain tolerant:
    note outputs stay equal on every test input
    (tests/test_inference.py::test_mulaw_wire_notes_agree). Opt-in, for
    bandwidth-starved links.

The device-side decode lives in the jitted pipeline and dispatches on the
array dtype, so each wire format is part of the bucket's compiled program.
The reference has no wire layer at all (GPU-local torch tensors,
reference: inference/me_infer.py:29-63).
"""
from __future__ import annotations

import numpy as np

MU = 255.0


def wire_np_dtype(wire: str):
    return {"int16": np.int16, "mulaw8": np.uint8}.get(wire, np.float32)


def wire_zero(wire: str):
    """The wire code for silence (mu-law's is 128, NOT 0 — a zero-filled
    uint8 buffer would decode padding to a -1.0 DC plateau)."""
    return encode_wire(np.zeros(1, np.float32), wire)[0]


def encode_wire(wave: np.ndarray, wire: str) -> np.ndarray:
    """float32 [-1, 1] waveform -> wire-format array (host side, numpy)."""
    if wire == "int16":
        return np.clip(np.round(wave * 32768.0), -32768, 32767).astype(np.int16)
    if wire == "mulaw8":
        x = np.clip(wave, -1.0, 1.0)
        y = np.sign(x) * np.log1p(MU * np.abs(x)) / np.log1p(MU)
        return np.round((y + 1.0) * 127.5).astype(np.uint8)
    return np.asarray(wave, np.float32)


def decode_wire_device(audio):
    """Wire array -> float32 waveform, inside the jitted pipeline.

    Dispatch is on dtype (static under jit): int16 -> /32768 (exact inverse
    of the host WAV scaling), uint8 -> mu-law expansion, float -> passthrough.
    """
    import jax.numpy as jnp

    if audio.dtype == jnp.int16:
        return audio.astype(jnp.float32) * (1.0 / 32768.0)
    if audio.dtype == jnp.uint8:
        y = audio.astype(jnp.float32) * (1.0 / 127.5) - 1.0
        return jnp.sign(y) * (jnp.expm1(jnp.abs(y) * jnp.log1p(MU)) / MU)
    return audio.astype(jnp.float32)

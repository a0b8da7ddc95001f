"""Host->device audio wire formats for the inference engine.

The serving bottleneck off-chip is link bandwidth (BENCH_NOTES.md: a 40 MB/s
dev tunnel caps ANY implementation near ~470x real time on float32 audio).
Four formats, selected by the ``transfer_dtype`` config key:

  * ``float32`` — 4 B/sample, bit-exact for arbitrary float sources.
  * ``int16`` (default) — 2 B/sample; exactly reproduces 16-bit-PCM-sourced
    waveforms after the on-device /32768 (virtually all real inputs).
  * ``mulaw12`` — 1.5 B/sample: mu-law companded (mu=255, the G.711 curve)
    quantized to 12 bits, sample pairs packed into 3 bytes. 24 dB finer
    than mulaw8 (~62 dB SNR for small signals); measured note F1 0.99 vs
    the float32 wire on the random-weights prod-geometry parity harness
    (2/179 knife-edge notes — tests/test_prod_parity.py, mulaw12 rows).
    Opt-in for bandwidth-starved links.
  * ``mulaw8`` — 1 B/sample, mu-law, 8-bit. LOSSY (~38 dB SNR, measured
    note F1 ~0.97 vs float32 at production geometry — BENCH_NOTES.md);
    opt-in for extremely bandwidth-starved links only.

The device-side decode lives in the jitted pipeline and is selected
statically by the engine's wire name (packed formats share the uint8 dtype,
so dtype dispatch alone is kept only as a compatibility fallback for the
unambiguous formats). The reference has no wire layer at all (GPU-local
torch tensors, reference: inference/me_infer.py:29-63).
"""
from __future__ import annotations

import numpy as np

MU = 255.0


def wire_np_dtype(wire: str):
    return {"int16": np.int16, "mulaw8": np.uint8,
            "mulaw12": np.uint8}.get(wire, np.float32)


def wire_zero(wire: str):
    """The wire code for silence, for SCALAR-per-sample formats (mu-law8's
    is 128, NOT 0 — a zero-filled uint8 buffer would decode padding to a
    -1.0 DC plateau). Packed formats have no per-sample scalar: use
    silence_buffer/silence_like."""
    if wire == "mulaw12":
        raise ValueError("mulaw12 is packed (3 bytes per 2 samples); "
                         "use silence_buffer/silence_like")
    return encode_wire(np.zeros(1, np.float32), wire)[0]


def wire_width(wire: str, n_samples: int) -> int:
    """Length of the last (wire) axis for an n_samples row."""
    if wire == "mulaw12":
        return ((n_samples + 1) // 2) * 3
    return n_samples


def silence_buffer(wire: str, rows: int, n_samples: int) -> np.ndarray:
    """[rows, wire_width] buffer whose every row decodes to exact silence."""
    row = encode_wire(np.zeros(n_samples, np.float32), wire)
    return np.broadcast_to(row, (rows, len(row))).copy()


def silence_like(wire: str, shape) -> np.ndarray:
    """Silence buffer matching an already-ENCODED array's shape (last axis
    is the wire axis: bytes for packed formats, samples otherwise)."""
    rows, width = shape
    if wire == "mulaw12":
        assert width % 3 == 0, "mulaw12 wire axis must be 3-byte groups"
        pattern = encode_wire(np.zeros(2, np.float32), wire)  # one group
        return np.broadcast_to(np.tile(pattern, width // 3),
                               (rows, width)).copy()
    return np.full(shape, wire_zero(wire), dtype=wire_np_dtype(wire))


def _mulaw_compress(wave: np.ndarray) -> np.ndarray:
    x = np.clip(wave, -1.0, 1.0)
    return np.sign(x) * np.log1p(MU * np.abs(x)) / np.log1p(MU)


def encode_wire(wave: np.ndarray, wire: str) -> np.ndarray:
    """float32 [-1, 1] waveform -> wire-format array (host side, numpy).

    Works on [..., n] arrays; the last axis is the sample axis. mulaw12
    pads odd sample counts with one silence sample (it decodes to exact
    0.0) so every packed group is complete."""
    if wire == "int16":
        return np.clip(np.round(wave * 32768.0), -32768, 32767).astype(np.int16)
    if wire == "mulaw8":
        y = _mulaw_compress(wave)
        return np.round((y + 1.0) * 127.5).astype(np.uint8)
    if wire == "mulaw12":
        wave = np.asarray(wave, np.float32)
        n = wave.shape[-1]
        if n % 2:
            pad = [(0, 0)] * (wave.ndim - 1) + [(0, 1)]
            wave = np.pad(wave, pad)
        y = _mulaw_compress(wave)
        # midtread: code 2048 IS exact silence (decodes to 0.0); range
        # [1, 4095], code 0 unused
        codes = (np.round(y * 2047.0) + 2048).astype(np.uint16)
        c = codes.reshape(*codes.shape[:-1], -1, 2).astype(np.uint32)
        b0 = c[..., 0] >> 4
        b1 = ((c[..., 0] & 0xF) << 4) | (c[..., 1] >> 8)
        b2 = c[..., 1] & 0xFF
        packed = np.stack([b0, b1, b2], axis=-1)
        return packed.reshape(*codes.shape[:-1], -1).astype(np.uint8)
    return np.asarray(wave, np.float32)


def decode_wire_device(audio, wire: str | None = None,
                       n_samples: int | None = None):
    """Wire array -> float32 waveform, inside the jitted pipeline.

    The array dtype (static under jit) identifies the format except for the
    two uint8 wires, where ``wire`` breaks the tie (mulaw8 when not given).
    Float input is always passthrough — e.g. deployment artifacts trace the
    pipeline with a float32 input contract whatever the engine's serving
    wire is. ``n_samples`` slices packed decodes back to the row's true
    sample count (static under jit)."""
    import jax.numpy as jnp

    def _expand(y):
        return jnp.sign(y) * (jnp.expm1(jnp.abs(y) * jnp.log1p(MU)) / MU)

    if jnp.issubdtype(audio.dtype, jnp.floating):
        wire = "float32"
    elif audio.dtype == jnp.int16:
        wire = "int16"
    elif wire not in ("mulaw8", "mulaw12"):
        wire = "mulaw8"
    if wire == "int16":
        out = audio.astype(jnp.float32) * (1.0 / 32768.0)
    elif wire == "mulaw8":
        out = _expand(audio.astype(jnp.float32) * (1.0 / 127.5) - 1.0)
    elif wire == "mulaw12":
        b = audio.astype(jnp.int32).reshape(*audio.shape[:-1], -1, 3)
        c0 = (b[..., 0] << 4) | (b[..., 1] >> 4)
        c1 = ((b[..., 1] & 0xF) << 8) | b[..., 2]
        codes = jnp.stack([c0, c1], axis=-1)
        codes = codes.reshape(*audio.shape[:-1], -1)
        out = _expand((codes.astype(jnp.float32) - 2048.0) * (1.0 / 2047.0))
    else:
        out = audio.astype(jnp.float32)
    if n_samples is not None:
        out = out[..., :n_samples]
    return out

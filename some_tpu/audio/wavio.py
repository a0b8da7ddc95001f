"""Host audio IO: WAV decode/encode and high-quality resampling.

Replaces the reference's librosa.load path (reference: infer.py:34,
preprocessing/me_binarizer.py:227): decode to float32 mono in [-1, 1] at a
requested sample rate. Decoding uses scipy's WAV reader; resampling is
polyphase (Kaiser-windowed sinc), equivalent quality to librosa's default
resampler for this pipeline's 44.1k/16k rates.
"""
from __future__ import annotations

import math
import pathlib

import numpy as np
from scipy.io import wavfile
from scipy.signal import resample_poly

_PCM_SCALE = {np.dtype(np.int16): 32768.0, np.dtype(np.int32): 2147483648.0,
              np.dtype(np.uint8): 128.0}


def resample(audio: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    """Polyphase resample along the last axis; float32 out."""
    if orig_sr == target_sr:
        return np.asarray(audio, dtype=np.float32)
    g = math.gcd(int(orig_sr), int(target_sr))
    out = resample_poly(np.asarray(audio, dtype=np.float64),
                        target_sr // g, orig_sr // g, axis=-1)
    return out.astype(np.float32)


def load_wav(path: pathlib.Path | str, sr: int | None = None,
             mono: bool = True) -> tuple[np.ndarray, int]:
    """Read a WAV file or file-like object -> (float32 waveform in [-1, 1],
    sample_rate)."""
    file_sr, data = wavfile.read(path if hasattr(path, "read") else str(path))
    if data.dtype in _PCM_SCALE:
        scale = _PCM_SCALE[data.dtype]
        if data.dtype == np.dtype(np.uint8):
            data = data.astype(np.float32) - 128.0
        data = np.asarray(data, dtype=np.float32) / scale
    else:
        data = np.asarray(data, dtype=np.float32)
    if mono and data.ndim > 1:
        data = data.mean(axis=1)
    if sr is not None and sr != file_sr:
        data = resample(data, file_sr, sr)
        file_sr = sr
    return np.ascontiguousarray(data, dtype=np.float32), file_sr


def save_wav(path: pathlib.Path | str, audio: np.ndarray, sr: int) -> None:
    """Write float32 [-1, 1] audio as 16-bit PCM."""
    pcm = np.clip(np.asarray(audio, dtype=np.float64), -1.0, 1.0)
    wavfile.write(str(path), sr, (pcm * 32767.0).astype(np.int16))


_WIRE_TAPS: dict = {}


def wire_decimation_taps(factor: int) -> np.ndarray:
    """Anti-alias FIR for the half-rate audio wire (``wire_sr`` config key).

    Design constraints, in order of importance:

    * ODD length with group delay ``(N-1)/2`` divisible by ``factor`` — the
      polyphase resampler then trims the delay to an INTEGER number of
      output samples. A fractional residual delay time-shifts every STFT
      frame and was measured to dominate the log-mel error (mean 7.6e-4 with
      a 64-tap even filter vs 2.9e-5 with this design, voice-band test).
    * Cutoff at the new Nyquist ``sr/(2*factor)``: the mel filterbank stops
      at ``fmax`` (8 kHz in production, 0.73x the 22.05 kHz wire Nyquist),
      so the transition band lives entirely in zero-weight spectrum and the
      passband is flat to ~1e-5 where the filterbank looks.
    * Kaiser beta 12 (~ -115 dB sidelobes): content above
      ``wire_sr - fmax`` (14.05 kHz) folds into the filterbank's support
      after decimation; at this stopband depth the folded residue sits far
      below the mel clamp for real audio.
    """
    taps = _WIRE_TAPS.get(factor)
    if taps is None:
        from scipy.signal import firwin
        taps = firwin(64 * factor + 1, 1.0 / factor,
                      window=("kaiser", 12.0)).astype(np.float32)
        _WIRE_TAPS[factor] = taps
    return taps


def decimate_wire(audio: np.ndarray, factor: int) -> np.ndarray:
    """Decimate float32 audio by an integer factor for the transfer wire.

    Gain-1 in the passband; the STFT magnitude compensation for the shorter
    analysis window (x ``factor``) is folded into the device mel's window
    (see some_tpu/ops/melspec.py ``mag_scale``), NOT applied here — the
    waveform keeps its true amplitude so wire encoding (int16/mulaw
    clipping) and silence thresholds behave identically."""
    if factor == 1:
        return np.asarray(audio, dtype=np.float32)
    taps = wire_decimation_taps(factor)
    if np.ndim(audio) == 1:
        # hot path: the C++ phase-decomposed FIR runs ~12x faster than
        # scipy's generic upfirdn loop (some_tpu/native/audio_frontend.cpp)
        from some_tpu.native import decimate_fir_native
        out = decimate_fir_native(np.asarray(audio, np.float32), taps, factor)
        if out is not None:
            return out
    return resample_poly(np.asarray(audio, dtype=np.float32), 1, factor,
                         axis=-1, window=taps).astype(np.float32)

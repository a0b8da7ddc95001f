"""Native (C++) host-plane kernels, loaded via ctypes with lazy build.

The shared library is compiled on first use with the image's g++ (no
pybind11 needed) and cached next to the source; every entry point has a
pure-numpy fallback so the framework works without a toolchain.
"""
from __future__ import annotations

import ctypes
import pathlib
import subprocess
import threading

import numpy as np

_SRC_DIR = pathlib.Path(__file__).parent


def _host_key() -> str:
    """Short tag identifying this host's ISA extensions. The library is
    built with -march=native, so a cached .so copied to a different CPU
    (container image, shared workdir) would load fine and then SIGILL at
    call time; keying the filename by the CPU flag set makes the existing
    build-on-miss path handle host changes instead."""
    import hashlib
    import platform

    flags = ""
    try:
        with open("/proc/cpuinfo", "r", encoding="utf8") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    flags = line
                    break
    except OSError:
        pass
    key = platform.machine() + ":" + " ".join(sorted(flags.split()))
    return hashlib.sha1(key.encode()).hexdigest()[:12]


_LIB_PATH = _SRC_DIR / f"libsome_audio-{_host_key()}.so"
_lock = threading.Lock()
_lib = None
_build_failed = False


def _build() -> bool:
    # -march=native unlocks the host's widest FMA for the FIR decimator;
    # retry portable if the flag is rejected (exotic/cross toolchains)
    base = ["g++", "-O3", "-shared", "-fPIC",
            str(_SRC_DIR / "audio_frontend.cpp"), "-o", str(_LIB_PATH)]
    for cmd in (base[:1] + ["-march=native"] + base[1:], base):
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            return True
        except Exception:
            continue
    return False


def _bind(lib) -> bool:
    """Declare signatures; False when the cached .so predates a symbol."""
    try:
        lib.rms_envelope.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.POINTER(ctypes.c_double), ctypes.c_int64]
        lib.rms_envelope.restype = None
        lib.slicer_scan.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_double,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64]
        lib.slicer_scan.restype = ctypes.c_int64
        lib.decimate_fir.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.c_int64, ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
        lib.decimate_fir.restype = None
    except AttributeError:
        return False
    return True


def get_lib():
    """Returns the loaded ctypes library, or None if unavailable."""
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    with _lock:
        if _lib is not None:
            return _lib
        for attempt in range(2):
            if (attempt or not _LIB_PATH.exists()) and not _build():
                _build_failed = True
                return None
            try:
                lib = ctypes.CDLL(str(_LIB_PATH))
            except OSError:
                _build_failed = True
                return None
            if _bind(lib):
                _lib = lib
                return _lib
            # stale cached .so missing a newer symbol: rebuild once
        _build_failed = True
        return None


def rms_envelope_native(y: np.ndarray, frame_length: int, hop_length: int):
    """Native RMS envelope, or None if the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    y = np.ascontiguousarray(y, dtype=np.float32)
    pad = frame_length // 2
    num_frames = (len(y) + 2 * pad - frame_length) // hop_length + 1
    out = np.empty(num_frames, dtype=np.float64)
    lib.rms_envelope(
        y.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(y),
        frame_length, hop_length,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), num_frames)
    return out


def slicer_scan_native(rms: np.ndarray, threshold: float, min_interval: int,
                       min_length: int, max_sil_kept: int):
    """Native silence scan -> list[(start, end)] frame tags, or None."""
    lib = get_lib()
    if lib is None:
        return None
    rms = np.ascontiguousarray(rms, dtype=np.float64)
    capacity = max(len(rms) // max(min_interval, 1) + 8, 16)
    tags = np.empty(capacity * 2, dtype=np.int64)
    count = lib.slicer_scan(
        rms.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(rms),
        float(threshold), min_interval, min_length, max_sil_kept,
        tags.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), capacity)
    return [(int(tags[2 * i]), int(tags[2 * i + 1])) for i in range(count)]


def decimate_fir_native(x: np.ndarray, taps: np.ndarray, factor: int):
    """Native polyphase FIR decimation (matches scipy resample_poly with
    odd gain-1 taps — see audio_frontend.cpp), or None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, dtype=np.float32)
    taps = np.ascontiguousarray(taps, dtype=np.float32)
    n_out = (len(x) + factor - 1) // factor
    out = np.empty(n_out, dtype=np.float32)
    lib.decimate_fir(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(x),
        taps.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(taps),
        factor, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_out)
    return out

"""SOME-TPU: a TPU-native singing-voice -> MIDI transcription framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of openvpi/SOME
(reference: singing-oriented MIDI extractor). The compute path is pure JAX
(jit/pjit over a device mesh, Pallas kernels for hot ops); the data plane and
MIDI assembly run on host.

Layering (bottom-up):
    utils/      pure-python helpers: note names, pitch curves, MIDI files
    audio/      host audio plane: WAV IO, resampling, silence slicer, numpy mel
    ops/        jitted JAX ops: log-mel frontend, framewise decoders
    nn/         flax.linen model zoo: dual-stream conformer, RMVPE
    compat/     PyTorch checkpoint interop (load reference ckpts)
    data/       binarized dataset store, deterministic bucketed sampler
    training/   optax-based train loop, schedules, checkpoints, tasks
    inference/  bucketed static-shape inference engines
    preprocessing/  dataset binarizers
    deployment/ StableHLO export of the fused waveform->notes graph
    parallel/   mesh + sharding helpers (DP-first, ICI collectives via GSPMD)
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

if _os.environ.get("SOME_TPU_PLATFORM"):
    # Escape hatch for environments whose sitecustomize pins jax_platforms
    # (e.g. forcing CPU for host-side smoke runs): applied before any
    # backend initialization as long as some_tpu is imported first.
    _jax.config.update("jax_platforms", _os.environ["SOME_TPU_PLATFORM"])

# Persistent XLA compile cache, applied through jax.config (NOT the
# JAX_COMPILATION_CACHE_DIR env var): this image's sitecustomize imports
# jax at interpreter startup, so jax's config snapshots the environment
# BEFORE any script-level os.environ.setdefault runs — every env-only
# setting was silently ignored and each new process re-paid multi-minute
# remote compiles (measured: the same RMVPE shape cost 117 s and 437 s in
# back-to-back processes while the 'warm' cache sat unused; with this
# applied a fresh process loads it in seconds). jax.config.update works at
# any time before first compile.
_jax.config.update(
    "jax_compilation_cache_dir",
    _os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/some_tpu_jax_cache"))
_jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
_jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

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

if _os.environ.get("SOME_TPU_PLATFORM"):
    # Escape hatch for environments whose sitecustomize pins jax_platforms
    # (e.g. forcing CPU for host-side smoke runs): applied before any
    # backend initialization as long as some_tpu is imported first.
    import jax as _jax
    _jax.config.update("jax_platforms", _os.environ["SOME_TPU_PLATFORM"])

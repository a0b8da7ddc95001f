"""Device mesh + sharding helpers (DP-first).

The reference's only distribution strategy is DDP over NCCL (SURVEY.md §2.3);
the TPU-native equivalent is a 1-D data mesh: parameters replicated, batches
sharded over the ``data`` axis, gradient psum inserted by GSPMD over ICI when
the jitted train step consumes sharded inputs and produces replicated state
(reference counterpart: utils/training_utils.py:307-319 get_strategy +
Lightning DDP; here the compiler does the collectives).

The mesh is 1-D but named, so wider layouts (fsdp/tensor axes) can be added
without touching call sites.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence] = None, axis_name: str = DATA_AXIS) -> Mesh:
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard axis 0 (batch) over the data axis."""
    return NamedSharding(mesh, P(axis_name))


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a host batch dict onto the mesh, batch axis sharded.

    Scalars / 0-d entries are replicated. Batch axis must be divisible by the
    mesh size — the collate layer pads batch rows to a power of two >= mesh
    size and marks fakes in 'batch_mask'.
    """
    data_sh = batch_sharding(mesh)
    repl = replicated_sharding(mesh)
    out = {}
    for key, value in batch.items():
        if np.ndim(value) == 0:
            continue  # host metadata (e.g. 'size') stays off-device
        arr = np.asarray(value)
        sh = data_sh if arr.shape[0] % mesh.devices.size == 0 else repl
        out[key] = jax.device_put(arr, sh)
    return out

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


def local_mesh_size(mesh: Mesh) -> int:
    """Number of this process's devices in the mesh (== mesh size when
    single-process)."""
    pid = jax.process_index()
    return sum(1 for d in mesh.devices.flat if d.process_index == pid)


# batch keys that must stay replicated even though they carry a leading axis
_REPLICATED_KEYS = ("t_real",)


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a host batch dict onto the mesh, batch axis sharded.

    Scalars / 0-d entries stay on the host. Batch axis must be divisible by
    the per-process mesh size — the collate layer pads batch rows to a power
    of two >= that and marks fakes in 'batch_mask'.

    Multi-process: each process passes its LOCAL rows; the returned arrays
    are global jax.Arrays of shape [B_local * process_count, ...] sharded
    over the data axis (assembled via make_array_from_process_local_data —
    no host gather, each shard goes straight to its devices).
    """
    data_sh = batch_sharding(mesh)
    repl = replicated_sharding(mesh)
    multiprocess = jax.process_count() > 1
    n_local = local_mesh_size(mesh)
    out = {}
    for key, value in batch.items():
        if np.ndim(value) == 0:
            continue  # host metadata (e.g. 'size') stays off-device
        arr = np.asarray(value)
        replicate = key in _REPLICATED_KEYS or arr.shape[0] % max(n_local, 1) != 0
        sh = repl if replicate else data_sh
        if multiprocess:
            out[key] = jax.make_array_from_process_local_data(sh, arr)
        else:
            out[key] = jax.device_put(arr, sh)
    return out

"""Multi-process (multi-host) runtime: initialization + global array assembly.

The reference scales across nodes through Lightning DDP (`devices` /
`num_nodes`, reference: train.py:62-64, utils/training_utils.py:307-319).
The TPU-native equivalent: every host joins one jax.distributed runtime, a
single global Mesh spans all chips, and each process feeds its addressable
shard of every batch — GSPMD then emits the gradient psum over ICI/DCN.

Environment contract (mirrors the standard JAX coordinator variables):
  SOME_TPU_COORDINATOR  host:port of process 0 (alias: JAX_COORDINATOR_ADDRESS)
  SOME_TPU_NUM_PROCESSES / SOME_TPU_PROCESS_ID  (aliases: JAX_NUM_PROCESSES,
  JAX_PROCESS_ID). On Cloud TPU pods none are needed — jax.distributed
  autodetects from the metadata server when SOME_TPU_MULTIHOST=auto is set.
"""
from __future__ import annotations

import logging
import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

log = logging.getLogger("some_tpu.distributed")

_ENV_ADDR = ("SOME_TPU_COORDINATOR", "JAX_COORDINATOR_ADDRESS")
_ENV_NPROC = ("SOME_TPU_NUM_PROCESSES", "JAX_NUM_PROCESSES")
_ENV_PID = ("SOME_TPU_PROCESS_ID", "JAX_PROCESS_ID")


def _env(names) -> Optional[str]:
    for name in names:
        value = os.environ.get(name)
        if value is not None:
            return value
    return None


def maybe_initialize() -> bool:
    """Join the multi-process runtime if coordinator env vars are set.

    Call once, before any backend use (train.py does). Returns True if
    jax.distributed was initialized by this call. No-ops (False) when no
    coordinator is configured — single-process behavior is unchanged.
    """
    # NOTE: no jax.devices()/process_count() before initialize() — any
    # backend-touching call would lock in a single-process runtime
    addr = _env(_ENV_ADDR)
    auto = os.environ.get("SOME_TPU_MULTIHOST", "").lower() == "auto"
    if addr is None and not auto:
        return False
    if jax.distributed.is_initialized():
        return False
    kwargs = {}
    if addr is not None:
        nproc, pid = _env(_ENV_NPROC), _env(_ENV_PID)
        if nproc is None or pid is None:
            raise RuntimeError(
                "SOME_TPU_COORDINATOR is set but SOME_TPU_NUM_PROCESSES / "
                "SOME_TPU_PROCESS_ID are not; set all three (or use "
                "SOME_TPU_MULTIHOST=auto on a Cloud TPU pod)")
        kwargs = dict(coordinator_address=addr, num_processes=int(nproc),
                      process_id=int(pid))
    jax.distributed.initialize(**kwargs)
    log.info("joined distributed runtime: process %d/%d, %d local / %d global devices",
             jax.process_index(), jax.process_count(),
             jax.local_device_count(), jax.device_count())
    return True


def replicate_to_mesh(tree, mesh: Mesh):
    """Place a host pytree fully replicated on a (possibly multi-process)
    mesh. Every process must hold the same values (true for seeded init and
    for checkpoints read from a shared filesystem)."""
    repl = NamedSharding(mesh, P())
    if jax.process_count() == 1:
        return jax.device_put(tree, repl)
    return jax.tree_util.tree_map(
        lambda leaf: jax.make_array_from_process_local_data(
            repl, np.asarray(leaf)), tree)


def global_batch_array(arr: np.ndarray, mesh: Mesh, axis_name: str = "data"):
    """Assemble a globally batch-sharded array from this process's rows.

    arr is the process-local slice [B_local, ...]; the global array is
    [B_local * process_count, ...] with axis 0 sharded over the mesh's data
    axis. Every process must pass the same B_local (the trainer's common-
    shape agreement guarantees this).
    """
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.make_array_from_process_local_data(sharding, arr)

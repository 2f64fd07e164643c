"""Multi-host (multi-slice) execution helpers.

The reference is strictly single-process/single-GPU (SURVEY.md §2c).  Here
multi-host runs use jax's built-in distributed runtime: every host calls
`initialize()` (coordinator address from env or args), builds the same global
mesh over all devices, and feeds only its local shard of each batch via
`host_local_batch` — XLA routes gradient all-reduces over ICI within a slice
and DCN across slices.  No custom transport layer (a deliberate design
decision, SURVEY.md §5).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize the jax distributed runtime (no-op for single process).

    Defaults come from the standard env vars (JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID) or the TPU metadata server on Cloud
    TPU pods.
    """
    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    nproc = num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "0") or 0)
    if not addr or nproc <= 1:
        return
    pid = process_id if process_id is not None else int(
        os.environ.get("JAX_PROCESS_ID", "0"))
    jax.distributed.initialize(coordinator_address=addr,
                               num_processes=nproc, process_id=pid)


def global_mesh(shape: Optional[Sequence[int]] = None,
                axis_names: Sequence[str] = ("data", "frame")) -> Mesh:
    """Mesh over ALL devices in the job (local + remote)."""
    devices = np.asarray(jax.devices())
    n = devices.size
    if shape is None:
        shape = (n, 1)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} != {n} global devices")
    return Mesh(devices.reshape(shape), axis_names)


def host_local_batch(global_batch_size: int) -> tuple[int, int]:
    """(local_batch_size, local_offset) for this host's shard of a batch
    laid out contiguously across processes."""
    nproc = jax.process_count()
    pid = jax.process_index()
    if global_batch_size % nproc:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by "
            f"{nproc} processes")
    local = global_batch_size // nproc
    return local, pid * local


def make_global_array(local_data: np.ndarray, mesh: Mesh,
                      spec: P = P("data")) -> jax.Array:
    """Assemble a globally sharded jax.Array from this host's local shard
    (jax.make_array_from_process_local_data)."""
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_process_local_data(sharding, local_data)

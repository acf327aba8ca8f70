"""Device mesh helpers.

One Mesh abstraction serves 1 chip, N local devices, and multi-host
slices (SURVEY.md §4 "Distributed tests without a cluster"): the same
shard_map code path runs everywhere; collectives ride ICI within a slice
and DCN across slices, inserted by XLA from the sharding annotations.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


DATA_AXIS = "data"


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Initialize jax.distributed for a real multi-host slice.

    This is the rebuild's MPI_Init (SURVEY.md §3.1 "MPI rank setup"):
    on TPU pods the three parameters come from the scheduling
    environment automatically (jax.distributed.initialize() with no
    args); pass them explicitly for manual bring-up. Returns the
    process count. Safe to call when already initialized or on a
    single-process run (no-op, returns current count).
    """
    import jax

    try:
        if coordinator_address is None and num_processes is None:
            jax.distributed.initialize()
        else:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
    except (RuntimeError, ValueError):
        pass  # already initialized, or single-process environment
    return jax.process_count()


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Tuple[str, ...] = (DATA_AXIS,),
    devices: Optional[Sequence] = None,
) -> Mesh:
    """1-D (default) mesh over the first n available devices.

    The assembler's parallelism is read-sharding (DP analog) with k-mer
    bucket ownership derived from position on the same axis (the
    "tensor-parallel" analog of SURVEY.md §2 — each device owns a bucket
    range of the global k-mer table), so a 1-D mesh suffices; the axis is
    laid out over ICI by create_device_mesh.
    """
    devs = list(devices if devices is not None else jax.devices())
    n = n_devices or len(devs)
    if n > len(devs):
        raise ValueError(f"requested {n} devices, have {len(devs)}")
    if len(axis_names) != 1:
        raise ValueError("make_mesh builds 1-D meshes")
    try:
        from jax.experimental import mesh_utils

        arr = mesh_utils.create_device_mesh((n,), devices=devs[:n])
    except Exception:
        arr = np.asarray(devs[:n])
    return Mesh(arr, axis_names)

"""Multi-host bootstrap: ``jax.distributed`` + a global mesh.

SURVEY §2.3 comm-backend row: collectives ride ICI within a pod slice
and DCN across slices; JAX inserts them from shardings.  What a
multi-host deployment needs from the framework is only the bootstrap —
initialize the process group, then build ONE global mesh over all
devices with 'dp' spanning hosts (DCN-friendly: batch-parallel traffic
crosses hosts, tensor-parallel traffic stays inside a slice on ICI).

Single-host (including the CPU test mesh) never calls this; it is the
entry point for real pod deployments and is validated here by argument
contract (multi-host hardware is not available in CI).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join the JAX process group.

    With no arguments, relies on the TPU environment's auto-bootstrap
    (GKE/TPU-VM metadata); arguments mirror
    ``jax.distributed.initialize``.  Safe to call once per process,
    before any backend use.  No-op for an explicit single-process spec.
    """
    if num_processes == 1:
        return
    if (coordinator_address is None) != (process_id is None):
        raise ValueError(
            "coordinator_address and process_id must be given together "
            "(or both omitted for TPU auto-bootstrap)"
        )
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_serving_mesh(tp: int = 1) -> Mesh:
    """('dp','tp') mesh over ALL processes' devices.

    'tp' groups stay within a host's devices (ICI); 'dp' spans hosts
    (DCN) — device order from ``jax.devices()`` is process-major, so
    reshaping to (n_devices//tp, tp) keeps each tp group local as long
    as tp divides the per-process device count.
    """
    devices = jax.devices()
    per_proc = jax.local_device_count()
    if tp > per_proc or per_proc % tp != 0:
        raise ValueError(
            f"tp={tp} must divide the per-process device count {per_proc} "
            "so tensor-parallel collectives stay on ICI"
        )
    if len(devices) % tp != 0:
        raise ValueError(f"{len(devices)} devices not divisible by tp={tp}")
    grid = np.asarray(devices).reshape(len(devices) // tp, tp)
    return Mesh(grid, ("dp", "tp"))

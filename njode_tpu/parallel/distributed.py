"""Multi-host (multi-slice) initialization.

The reference's only multi-machine mechanism is independent SLURM jobs
(reference run_array_job.sh:23-47).  TPU-natively, multi-host training is a
single SPMD program: call :func:`initialize_distributed` once per host
before building a mesh, and the ('data','model') mesh then spans all hosts
(collectives ride ICI within a slice, DCN across slices).
"""

from __future__ import annotations

import os
from typing import Optional


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> int:
    """Initialize jax.distributed (idempotent). Returns the process index.

    With no arguments, relies on the TPU environment's auto-detection
    (GCE metadata / megascale env vars); explicit args mirror
    ``jax.distributed.initialize``.
    """
    import jax

    if int(os.environ.get("JAX_NUM_PROCESSES", "1")) == 1 and (
            coordinator_address is None and num_processes in (None, 1)):
        return 0
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    except RuntimeError as e:  # already initialized
        if "already" not in str(e).lower():
            raise
    return jax.process_index()


def global_mesh(model: int = 1):
    """A ('data','model') mesh over ALL processes' devices."""
    import jax
    from .mesh import make_mesh
    return make_mesh(model=model, devices=jax.devices())

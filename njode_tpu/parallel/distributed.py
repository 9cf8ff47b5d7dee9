"""Multi-host (multi-slice) initialization.

The reference's only multi-machine mechanism is independent SLURM jobs
(reference run_array_job.sh:23-47).  TPU-natively, multi-host training is a
single SPMD program: call :func:`initialize_distributed` once per host
before building a mesh, and the ('data','model') mesh then spans all hosts
(collectives ride ICI within a slice, DCN across slices).
"""

from __future__ import annotations

import sys
from typing import Optional


def _already_initialized() -> bool:
    try:
        from jax._src import distributed as _dist
        return _dist.global_state.client is not None
    except Exception:
        return False


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> int:
    """Initialize jax.distributed (idempotent). Returns the process index.

    With no arguments, attempts JAX's cluster auto-detection (TPU metadata /
    SLURM env); if that fails — the normal case on a single-host dev box —
    it degrades to single-process mode with a note instead of raising.
    Explicit args mirror ``jax.distributed.initialize`` and failures there
    propagate.
    """
    import jax

    if _already_initialized():
        return jax.process_index()
    explicit = coordinator_address is not None or process_id is not None \
        or (num_processes is not None and num_processes > 1)
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    except (ValueError, RuntimeError) as e:
        msg = str(e).lower()
        if "once" in msg:  # raced with another initializer — already set up
            return jax.process_index()
        if explicit:
            raise
        # No explicit args: degrading to single-process is correct on a dev
        # box, but on a real pod it would make every host train an
        # independent model believing it is process 0 — so raise whenever
        # the environment looks multi-host.
        if _looks_multihost():
            raise
        print(f"initialize_distributed: single-process mode "
              f"({e})", file=sys.stderr)
        return 0
    return jax.process_index()


def _looks_multihost() -> bool:
    import os
    hosts = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    if hosts and len(hosts.split(",")) > 1:
        return True
    for var in ("MEGASCALE_NUM_SLICES", "SLURM_NTASKS", "OMPI_COMM_WORLD_SIZE"):
        try:
            if int(os.environ.get(var, "1")) > 1:
                return True
        except ValueError:
            pass
    return False


def global_mesh(model: int = 1):
    """A ('data','model') mesh over ALL processes' devices."""
    import jax
    from .mesh import make_mesh
    return make_mesh(model=model, devices=jax.devices())

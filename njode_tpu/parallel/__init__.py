"""Parallelism layer: device meshes, DP/EP shardings (no reference analogue —
the reference is single-process PyTorch; see SURVEY.md §2b rows P1-P3)."""

from .mesh import batch_spec, make_batch_sharder, make_mesh, shard_params
from .distributed import global_mesh, initialize_distributed

__all__ = ["batch_spec", "make_batch_sharder", "make_mesh", "shard_params",
           "global_mesh", "initialize_distributed"]

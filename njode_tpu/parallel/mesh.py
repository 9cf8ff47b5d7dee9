"""Device mesh + sharding utilities.

The reference has NO multi-device support of any kind (SURVEY.md §2
parallelism census — no torch.distributed, no NCCL; its cluster story is
independent SLURM jobs).  These are the TPU-native first-class equivalents:

* ``make_mesh``          — a ('data', 'model') mesh over ICI.
* ``make_batch_sharder`` — shard the trajectory axis over 'data' (DP).
* ``shard_params``       — replicate params, or shard over 'model' either
  the stacked moment axis of separate-network params (the K per-moment
  networks are independent experts — genuine expert parallelism for the
  NJ-ODE architecture) or the hidden feature axis of the MLP weights
  (tensor parallelism: XLA/GSPMD partitions every matmul column-wise and
  inserts the collectives).  TP only pays at large hidden widths — at the
  shipped 32–256 the collectives outweigh the split FLOPs (SURVEY.md §2b
  row P2) — but the mesh API supports it for scaled configs.

Under ``jax.jit`` with sharded inputs, XLA propagates the shardings through
the scan and inserts the gradient ``psum`` over 'data' automatically —
collectives ride ICI, nothing is hand-scheduled.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: Optional[int] = None, model: int = 1,
              devices=None) -> Mesh:
    """Create a ('data', 'model') mesh.  data=None uses all devices / model."""
    devs = list(devices if devices is not None else jax.devices())
    if data is None:
        data = max(1, len(devs) // model)
    n = data * model
    if n > len(devs):
        raise ValueError(f"mesh {data}x{model} needs {n} devices, "
                         f"have {len(devs)}")
    return Mesh(np.asarray(devs[:n]).reshape(data, model), ("data", "model"))


def batch_spec(ndim: int) -> P:
    return P("data", *([None] * (ndim - 1)))


def _global_put(x, mesh: Mesh, spec: P):
    """device_put that also works when ``mesh`` spans multiple processes.

    Single process: plain ``jax.device_put``.  Multi-process: every process
    holds the SAME full value (data generation and init are deterministic),
    so each contributes its addressable shards via
    ``jax.make_array_from_callback`` and the result is one global
    ``jax.Array`` laid out per ``spec``.
    """
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    xnp = np.asarray(x)
    return jax.make_array_from_callback(xnp.shape, sharding,
                                        lambda idx: xnp[idx])


def make_batch_sharder(mesh: Mesh):
    """Returns shard(*arrays) placing the leading (trajectory) axis on 'data'.

    Falls back to no-op placement when the batch doesn't divide the mesh
    (keeps small eval batches working on big meshes).
    """
    n_data = mesh.shape["data"]

    def shard(*arrays):
        out = []
        for a in arrays:
            if a.shape[0] % n_data == 0:
                out.append(_global_put(a, mesh, batch_spec(a.ndim)))
            else:
                out.append(_global_put(a, mesh, P()))
        return tuple(out) if len(out) > 1 else out[0]

    return shard


def shard_params(mesh: Mesh, params, moment_axis: bool = False,
                 hidden_axis: bool = False):
    """Place parameters on the mesh.

    moment_axis=True shards the leading stacked-K axis of separate-network
    params over 'model' (expert parallelism over moments) when divisible.
    hidden_axis=True shards the trailing feature axis of weights/biases
    over 'model' (tensor parallelism over the hidden width; output heads
    whose width doesn't divide stay replicated).  Anything that matches
    neither rule is replicated.
    """
    n_model = mesh.shape["model"]

    def place(x):
        if (moment_axis and n_model > 1 and x.ndim >= 1
                and x.shape[0] % n_model == 0 and x.shape[0] > 1):
            return _global_put(x, mesh, P("model", *([None] * (x.ndim - 1))))
        if (hidden_axis and n_model > 1 and x.ndim >= 1
                and x.shape[-1] % n_model == 0 and x.shape[-1] > 1):
            return _global_put(x, mesh, P(*([None] * (x.ndim - 1)), "model"))
        return _global_put(x, mesh, P())

    return jax.tree_util.tree_map(place, params)

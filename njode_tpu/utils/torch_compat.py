"""Import weights from reference PyTorch checkpoints.

Lets a user of the reference library load a trained ``model.pt``
(``torch.save`` bundle, reference utils/training.py:289-298) into the
TPU-native parameter pytree, so existing checkpoints carry over.

Layout mapping: each reference sub-network is an ``nn.Sequential`` whose
Linear layers appear at known positions; we recover them ordered by their
Sequential index, transpose weights to the ``x @ w`` orientation, and stack
per-moment copies on a leading K axis (separate-network mode,
reference models/jump_ode.py:111-113).
"""

from __future__ import annotations

import re
from typing import Any, Mapping

import jax.numpy as jnp
import numpy as np


def _to_np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype=np.float32)


def _mlp_from_state(sd: Mapping[str, Any], prefix: str) -> dict:
    pat = re.compile(re.escape(prefix) + r"\.net\.(\d+)\.weight$")
    idxs = sorted(int(m.group(1)) for k in sd if (m := pat.match(k)))
    layers = []
    for i in idxs:
        w = _to_np(sd[f"{prefix}.net.{i}.weight"]).T  # torch stores (out, in)
        b = _to_np(sd[f"{prefix}.net.{i}.bias"])
        layers.append({"w": jnp.asarray(w), "b": jnp.asarray(b)})
    if not layers:
        raise KeyError(f"no Linear layers found under '{prefix}.net.*' in state dict")
    return {"layers": layers}


def _stack(mlps: list[dict]) -> dict:
    import jax
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=0), *mlps)


def params_from_torch_state_dict(state_dict: Mapping[str, Any],
                                 num_moments: int,
                                 shared_network: bool) -> dict:
    """Convert a reference ``model_state_dict`` to an njode_tpu param pytree."""
    if shared_network:
        return {
            "jump": _mlp_from_state(state_dict, "jump_nn"),
            "ode": _mlp_from_state(state_dict, "ode_func"),
            "out": _mlp_from_state(state_dict, "output_nn"),
        }
    return {
        "jump": _stack([_mlp_from_state(state_dict, f"jump_nns.{m}")
                        for m in range(num_moments)]),
        "ode": _stack([_mlp_from_state(state_dict, f"ode_funcs.{m}")
                       for m in range(num_moments)]),
        "out": _stack([_mlp_from_state(state_dict, f"output_nns.{m}")
                       for m in range(num_moments)]),
    }


def params_from_torch_checkpoint(path: str, num_moments: int,
                                 shared_network: bool) -> dict:
    """Load a reference ``model.pt`` file (requires torch installed)."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model_state_dict", ckpt)
    return params_from_torch_state_dict(sd, num_moments, shared_network)


# --------------------------------------------------------------------------
# export (njode_tpu -> reference layout)
# --------------------------------------------------------------------------

def _sequential_linear_indices(kind: str, n_hidden_layers: int) -> list[int]:
    """Positions of Linear modules inside each reference nn.Sequential.

    JumpNN:   [Linear, act] + n x [Drop, Linear, act]        -> 0, 3, 6, ...
    ODEFunc:  [Linear, act] + (n-1) x [Drop, Linear, act] + [Drop, Linear]
    OutputNN: n x [Linear, act, Drop] + [Linear]             -> 0, 3, ..., 3n
    (reference models/jump_ode.py:19-21, 36-39, 70-74)
    """
    if kind == "jump":
        return [0] + [3 * i for i in range(1, n_hidden_layers + 1)]
    if kind == "ode":
        mids = [3 * i for i in range(1, n_hidden_layers)]
        last = 3 * (n_hidden_layers - 1) + 3 if n_hidden_layers > 1 else 3
        return [0] + mids + [last]
    if kind == "out":
        return [3 * i for i in range(n_hidden_layers + 1)]
    raise ValueError(kind)


def params_to_torch_state_dict(params: dict, num_moments: int,
                               shared_network: bool,
                               n_hidden_layers: int = 1) -> dict:
    """Convert an njode_tpu param pytree to a reference-loadable state dict
    (tensor names/orientations of the reference NeuralJumpODE modules)."""
    import numpy as np
    import torch

    out = {}

    def put(prefix, kind, mlp, k=None):
        idxs = _sequential_linear_indices(kind, n_hidden_layers)
        layers = mlp["layers"]
        assert len(idxs) == len(layers), (prefix, len(idxs), len(layers))
        for pos, layer in zip(idxs, layers):
            w = np.asarray(layer["w"] if k is None else layer["w"][k])
            b = np.asarray(layer["b"] if k is None else layer["b"][k])
            out[f"{prefix}.net.{pos}.weight"] = torch.tensor(w.T.copy())
            out[f"{prefix}.net.{pos}.bias"] = torch.tensor(b.copy())

    if shared_network:
        put("jump_nn", "jump", params["jump"])
        put("ode_func", "ode", params["ode"])
        put("output_nn", "out", params["out"])
    else:
        for m in range(num_moments):
            put(f"jump_nns.{m}", "jump", params["jump"], m)
            put(f"ode_funcs.{m}", "ode", params["ode"], m)
            put(f"output_nns.{m}", "out", params["out"], m)
    return out

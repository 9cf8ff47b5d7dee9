"""Single-file checkpointing with auto-resume semantics.

TPU-native equivalent of the reference's ``torch.save`` bundle
(reference: utils/training.py:289-308): one file holding model params,
optimizer state and the training histories, written atomically
(tmp + rename) so a preempted job never sees a torn checkpoint.

Serialization is msgpack over numpy-ified pytrees (flax.serialization), so
checkpoints are portable across hosts and JAX versions; restore goes through
``from_state_dict`` against freshly-initialised templates, which validates
tree structure and shapes.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
from flax import serialization

HISTORY_KEYS = ("train_losses", "val_losses", "epoch_times", "relative_loss")


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, params: Any, opt_state: Any,
                    histories: dict[str, list]) -> None:
    """Write params + optimizer state + histories to a single file."""
    state = {
        "model_state_dict": _to_numpy(serialization.to_state_dict(params)),
        "optimizer_state_dict": _to_numpy(serialization.to_state_dict(opt_state)),
    }
    for k in HISTORY_KEYS:
        state[k] = np.asarray(histories.get(k, []), dtype=np.float64)
    blob = serialization.msgpack_serialize(state)
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)


def load_checkpoint(path: str, params_template: Any,
                    opt_state_template: Any) -> tuple[Any, Any, dict[str, list]]:
    """Restore (params, opt_state, histories) from ``path``.

    Raises on any structural mismatch — callers implement the reference's
    degrade-to-fresh-training behaviour (reference utils/training.py:172-174).
    """
    with open(path, "rb") as f:
        state = serialization.msgpack_restore(f.read())
    params = serialization.from_state_dict(params_template,
                                           state["model_state_dict"])
    opt_state = serialization.from_state_dict(opt_state_template,
                                              state["optimizer_state_dict"])
    histories = {k: [float(x) for x in np.asarray(state.get(k, []))]
                 for k in HISTORY_KEYS}
    return params, opt_state, histories


def load_params(path: str, params_template: Any) -> Any:
    """Restore only the model parameters (for inference/plotting,
    reference experiments/experiment_black_scholes.py:159-160)."""
    with open(path, "rb") as f:
        state = serialization.msgpack_restore(f.read())
    return serialization.from_state_dict(params_template,
                                         state["model_state_dict"])


def checkpoint_exists(path: Optional[str]) -> bool:
    return bool(path) and os.path.exists(path)

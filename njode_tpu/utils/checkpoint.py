"""Checkpointing with auto-resume semantics — msgpack (default) or Orbax.

TPU-native equivalent of the reference's ``torch.save`` bundle
(reference: utils/training.py:289-308): model params, optimizer state and
the training histories in one artifact, written atomically so a preempted
job never sees a torn checkpoint.

Two interchangeable backends behind the same three functions:

* ``msgpack`` (default): one flat file of msgpack over numpy-ified pytrees
  (flax.serialization) — portable across hosts and JAX versions, ideal for
  single-host runs and the reference's single-file artifact layout.
  Under multi-host training only process 0 writes, so resume requires the
  checkpoint path to live on a filesystem every process can read (true on
  SLURM clusters and TPU pods with NFS/GCS-fuse; NOT true for
  node-local /tmp) — use ``orbax`` when there is no shared filesystem.
* ``orbax``: an Orbax PyTree checkpoint DIRECTORY at the same path — for
  multi-host / sharded ``jax.Array`` params (each host writes only its
  shards; Orbax reassembles on restore).  Opt in with
  ``config["checkpoint_backend"] = "orbax"`` / ``--checkpoint-backend orbax``.

Loading auto-detects the backend from the artifact on disk (directory =
orbax, file = msgpack), so resume works regardless of which backend wrote
the checkpoint.  Restores go through ``from_state_dict`` against
freshly-initialised templates, which validates tree structure and shapes.
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


def _bundle(params: Any, opt_state: Any, histories: dict[str, list]) -> dict:
    state = {
        "model_state_dict": _to_numpy(serialization.to_state_dict(params)),
        "optimizer_state_dict": _to_numpy(serialization.to_state_dict(opt_state)),
    }
    for k in HISTORY_KEYS:
        state[k] = np.asarray(histories.get(k, []), dtype=np.float64)
    extra = _extra_histories(histories)
    if extra:
        state["extra_histories"] = extra
    return state


def _extra_histories(histories: dict) -> dict:
    """History keys beyond the reference's four — e.g. the (n_epochs, K)
    per-member loss matrices of ensemble runs — as float64 arrays."""
    return {k: np.asarray(v, dtype=np.float64)
            for k, v in histories.items() if k not in HISTORY_KEYS}


def _unbundle(state: dict, params_template: Any, opt_state_template: Any):
    params = serialization.from_state_dict(params_template,
                                           state["model_state_dict"])
    opt_state = serialization.from_state_dict(opt_state_template,
                                              state["optimizer_state_dict"])
    histories = {k: [float(x) for x in np.asarray(state.get(k, []))]
                 for k in HISTORY_KEYS}
    for k, v in state.get("extra_histories", {}).items():
        histories[k] = np.asarray(v).tolist()
    return params, opt_state, histories


def save_checkpoint(path: str, params: Any, opt_state: Any,
                    histories: dict[str, list],
                    backend: str = "msgpack") -> None:
    """Write params + optimizer state + histories to ``path``.

    ``backend="msgpack"`` writes one file; ``backend="orbax"`` an Orbax
    checkpoint directory (supports sharded multi-host params).  Both write
    the full checkpoint to a side path FIRST and only then swap it in, so a
    preemption never leaves the run without a loadable checkpoint (the
    remaining window is the two-rename swap when switching backends over an
    existing artifact of the other kind).
    """
    import shutil

    multiproc = jax.process_count() > 1
    primary = jax.process_index() == 0

    def _barrier(tag):
        if multiproc:
            from jax.experimental import multihost_utils
            multihost_utils.sync_global_devices(f"njode-ckpt-{tag}")

    abspath = os.path.abspath(path)
    os.makedirs(os.path.dirname(abspath), exist_ok=True)
    if backend == "orbax":
        import orbax.checkpoint as ocp
        state = {
            "model_state_dict": serialization.to_state_dict(params),
            "optimizer_state_dict": serialization.to_state_dict(opt_state),
            # orbax refuses zero-size arrays; empty histories are omitted and
            # default back to [] on restore (_unbundle's .get)
            **{k: np.asarray(histories[k], dtype=np.float64)
               for k in HISTORY_KEYS if len(histories.get(k, []))},
        }
        extra = {k: v for k, v in _extra_histories(histories).items()
                 if v.size}
        if extra:
            state["extra_histories"] = extra
        tmpdir = abspath + ".tmp_orbax"
        if primary and os.path.isdir(tmpdir):
            shutil.rmtree(tmpdir)
        _barrier("pre-save")
        # collective: every process calls save (each writes only the shards
        # it addresses; orbax coordinates the commit across processes)
        with ocp.PyTreeCheckpointer() as ckptr:
            ckptr.save(tmpdir, state)
        _barrier("saved")
        if primary:
            if os.path.isdir(abspath):
                shutil.rmtree(abspath)
            elif os.path.isfile(abspath):  # switching backend over an old file
                os.remove(abspath)
            os.rename(tmpdir, abspath)
        _barrier("swapped")
        return
    if backend != "msgpack":
        raise ValueError(f"Unknown checkpoint backend: {backend}")
    if multiproc:
        leaves = jax.tree_util.tree_leaves((params, opt_state))
        if any(getattr(x, "is_fully_addressable", True) is False
               for x in leaves):
            # cross-process shards cannot be numpy-ified by one writer;
            # orbax saves collectively (each process writes its shards) and
            # the loader auto-detects the format, so resume still works
            if primary:
                print("save_checkpoint: params are sharded across processes;"
                      " msgpack cannot serialize them — writing an Orbax"
                      " checkpoint instead (auto-detected on load)")
            return save_checkpoint(path, params, opt_state, histories,
                                   backend="orbax")
    if primary:
        # params are replicated (or numpy) on every process; one writer is
        # enough and avoids same-file races on a shared filesystem
        blob = serialization.msgpack_serialize(
            _bundle(params, opt_state, histories))
        tmp = abspath + ".tmp"
        with open(tmp, "wb") as f:
            f.write(blob)
        if os.path.isdir(abspath):  # switching backend over an old orbax dir
            shutil.rmtree(abspath)
        os.replace(tmp, abspath)
    _barrier("msgpack-written")


def _key_name(k) -> str:
    """Normalize a jax tree-path key (DictKey/SequenceKey/GetAttrKey)."""
    for attr in ("key", "idx", "name"):
        if hasattr(k, attr):
            return str(getattr(k, attr))
    return str(k)


def _orbax_restore_args(meta_tree, templates: dict):
    """Per-leaf restore args keyed off the checkpoint's own structure.

    Leaves that have a counterpart in ``templates`` restore directly onto
    the template's sharding — this is what makes resume correct when the
    restoring job runs on a different topology than the writer (the actual
    preemption story multi-host checkpointing exists for); without it Orbax
    guesses from the snapshot and warns.  Leaves with no template
    counterpart (histories, forward-compat extras) restore as plain numpy.
    """
    import orbax.checkpoint as ocp

    flat_tpl = {}
    for top, tree in templates.items():
        if tree is None:
            continue
        sd = serialization.to_state_dict(tree)
        for kp, leaf in jax.tree_util.tree_flatten_with_path(sd)[0]:
            flat_tpl[(top,) + tuple(_key_name(k) for k in kp)] = leaf

    def one(kp, _meta):
        leaf = flat_tpl.get(tuple(_key_name(k) for k in kp))
        sharding = getattr(leaf, "sharding", None)
        if sharding is not None:
            return ocp.ArrayRestoreArgs(sharding=sharding,
                                        global_shape=leaf.shape,
                                        dtype=leaf.dtype)
        return ocp.RestoreArgs(restore_type=np.ndarray)

    return jax.tree_util.tree_map_with_path(one, meta_tree)


def _read_state(path: str, templates: Optional[dict] = None) -> dict:
    """Read the raw checkpoint bundle, auto-detecting the backend.

    ``templates`` maps top-level bundle keys (``model_state_dict``,
    ``optimizer_state_dict``) to live pytrees whose shardings the Orbax
    restore should target; ignored for msgpack (host numpy either way).
    """
    if os.path.isdir(path):
        import orbax.checkpoint as ocp
        abspath = os.path.abspath(path)
        with ocp.PyTreeCheckpointer() as ckptr:
            if templates:
                meta = ckptr.metadata(abspath).item_metadata
                restore_args = _orbax_restore_args(meta, templates)
                return ckptr.restore(abspath, restore_args=restore_args)
            return ckptr.restore(abspath)
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def load_checkpoint(path: str, params_template: Any,
                    opt_state_template: Any) -> tuple[Any, Any, dict[str, list]]:
    """Restore (params, opt_state, histories) from ``path`` (either backend).

    Raises on any structural mismatch — callers implement the reference's
    degrade-to-fresh-training behaviour (reference utils/training.py:172-174).
    """
    state = _read_state(path, templates={
        "model_state_dict": params_template,
        "optimizer_state_dict": opt_state_template,
    })
    return _unbundle(state, params_template, opt_state_template)


def load_params(path: str, params_template: Any) -> Any:
    """Restore only the model parameters (for inference/plotting,
    reference experiments/experiment_black_scholes.py:159-160)."""
    state = _read_state(path, templates={"model_state_dict": params_template})
    return serialization.from_state_dict(params_template,
                                         state["model_state_dict"])


def checkpoint_exists(path: Optional[str]) -> bool:
    return bool(path) and os.path.exists(path)

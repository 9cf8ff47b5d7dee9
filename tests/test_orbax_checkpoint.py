"""Orbax checkpoint backend (multi-host/sharded alternative to msgpack).

Same three-function surface as the default backend (checkpoint.py);
loading auto-detects which backend wrote the artifact (directory = orbax,
file = msgpack), so auto-resume (reference utils/training.py:146-174
semantics) works across a backend switch.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from njode_tpu import NeuralJumpODE
from njode_tpu.utils.checkpoint import (
    load_checkpoint,
    load_params,
    save_checkpoint,
)
from njode_tpu.utils.training import make_adam, run_experiment

TINY = dict(
    experiment_name="orbax_bs",
    input_dim=1, hidden_dim=8, output_dim=1,
    n_hidden_layers=1, activation="relu", dropout_rate=0.0,
    input_scaling="identity", variance_method="direct", dt_ode_step=None,
    learning_rate=1e-2, weight_decay=5e-4, n_epochs=4, batch_size=8,
    shuffle=True, print_every=2, device="auto", ignore_first_continuity=True,
    num_moments=2, moment_weights=[1.0, 10.0], shared_network=False,
    checkpoint_backend="orbax",
    data=dict(process_type="black_scholes", n_train=16, n_val=8,
              obs_fraction=0.1, cache_data=True, mu=0.1, sigma=0.5,
              T=1.0, n_steps=50, x0=1.0),
)


def _model_and_state():
    model = NeuralJumpODE(input_dim=1, hidden_dim=8, output_dim=1,
                          num_moments=2)
    params = model.init(jax.random.PRNGKey(0))
    tx = make_adam(1e-3, 1e-4)
    return model, params, tx, tx.init(params)


def _assert_trees_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_orbax_roundtrip(tmp_path):
    _, params, _, opt_state = _model_and_state()
    hist = {"train_losses": [3.0, 2.0], "val_losses": [2.5],
            "epoch_times": [0.1, 0.2], "relative_loss": [1.5]}
    path = str(tmp_path / "model.ckpt")
    save_checkpoint(path, params, opt_state, hist, backend="orbax")
    assert (tmp_path / "model.ckpt").is_dir()  # orbax writes a directory

    p2, o2, h2 = load_checkpoint(path, params, opt_state)
    _assert_trees_equal(params, p2)
    _assert_trees_equal(opt_state, o2)
    assert h2["train_losses"] == [3.0, 2.0]
    assert h2["relative_loss"] == [1.5]
    _assert_trees_equal(params, load_params(path, params))

    # overwrite in place (force) with updated histories
    hist["train_losses"].append(1.0)
    save_checkpoint(path, params, opt_state, hist, backend="orbax")
    _, _, h3 = load_checkpoint(path, params, opt_state)
    assert h3["train_losses"] == [3.0, 2.0, 1.0]


def test_backend_switch_over_existing_file(tmp_path):
    """orbax save replaces a previous msgpack file at the same path."""
    _, params, _, opt_state = _model_and_state()
    hist = {k: [] for k in ("train_losses", "val_losses", "epoch_times",
                            "relative_loss")}
    path = str(tmp_path / "model.ckpt")
    save_checkpoint(path, params, opt_state, hist, backend="msgpack")
    assert (tmp_path / "model.ckpt").is_file()
    save_checkpoint(path, params, opt_state, hist, backend="orbax")
    assert (tmp_path / "model.ckpt").is_dir()
    p2, _, _ = load_checkpoint(path, params, opt_state)
    _assert_trees_equal(params, p2)


def test_unknown_backend_raises(tmp_path):
    _, params, _, opt_state = _model_and_state()
    with pytest.raises(ValueError):
        save_checkpoint(str(tmp_path / "x"), params, opt_state, {},
                        backend="pickle")


def test_orbax_sharded_params_roundtrip(tmp_path):
    """Sharded jax.Arrays (8-device CPU mesh) save and restore losslessly."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    mesh = Mesh(np.asarray(devs[:8]).reshape(8), ("data",))
    x = jnp.arange(64, dtype=jnp.float32).reshape(8, 8)
    xs = jax.device_put(x, NamedSharding(mesh, P("data", None)))
    params = {"layers": [{"w": xs, "b": jnp.zeros((8,))}]}
    path = str(tmp_path / "sharded.ckpt")
    save_checkpoint(path, params, {"count": jnp.zeros(())},
                    {"train_losses": [1.0]}, backend="orbax")
    p2, _, h2 = load_checkpoint(path, params, {"count": jnp.zeros(())})
    np.testing.assert_array_equal(np.asarray(p2["layers"][0]["w"]), np.asarray(x))
    assert h2["train_losses"] == [1.0]


def test_orbax_restore_onto_different_topology(tmp_path):
    """Restore targets the TEMPLATE's shardings, not the snapshot's.

    Saves params sharded over an 8-device mesh, then restores against a
    template living on a different topology (4-device mesh).  This is the
    preemption-resume story multi-host checkpointing exists for; the
    restore must land on the new mesh and must not fall back to orbax's
    'restoring on a different topology is unsafe' guessing path.
    """
    import warnings
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    mesh8 = Mesh(np.asarray(devs[:8]).reshape(8), ("data",))
    x = jnp.arange(64, dtype=jnp.float32).reshape(8, 8)
    params8 = {"w": jax.device_put(x, NamedSharding(mesh8, P("data", None)))}
    path = str(tmp_path / "model.ckpt")
    save_checkpoint(path, params8, {"count": jnp.zeros(())},
                    {"train_losses": [1.0]}, backend="orbax")

    mesh4 = Mesh(np.asarray(devs[:4]).reshape(4), ("data",))
    tpl = {"w": jax.device_put(x, NamedSharding(mesh4, P("data", None)))}
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any topology warning fails the test
        p2, _, h2 = load_checkpoint(path, tpl, {"count": jnp.zeros(())})
        p3 = load_params(path, tpl)
    np.testing.assert_array_equal(np.asarray(p2["w"]), np.asarray(x))
    np.testing.assert_array_equal(np.asarray(p3["w"]), np.asarray(x))
    assert p2["w"].sharding.is_equivalent_to(tpl["w"].sharding, 2)
    assert h2["train_losses"] == [1.0]


def test_run_experiment_resume_with_orbax(tmp_path):
    """End-to-end: train with the orbax backend, auto-resume, extend."""
    cfg = json.loads(json.dumps(TINY))
    res = run_experiment(cfg, save_dir=str(tmp_path))
    h = res["history"]
    assert len(h["train_loss"]) == 4
    assert (tmp_path / "orbax_bs" / "model.ckpt").is_dir()

    # already complete -> early return
    res2 = run_experiment(cfg, save_dir=str(tmp_path))
    assert res2["history"].get("resumed_from_checkpoint") is True

    # extend: continues from epoch 4, preserving history
    cfg["n_epochs"] = 6
    res3 = run_experiment(cfg, save_dir=str(tmp_path))
    assert len(res3["history"]["train_loss"]) == 6
    np.testing.assert_allclose(res3["history"]["train_loss"][:4],
                               h["train_loss"], rtol=1e-6)


def test_msgpack_save_over_existing_orbax_dir(tmp_path):
    """Switching orbax -> msgpack must replace the directory, not crash."""
    _, params, _, opt_state = _model_and_state()
    hist = {"train_losses": [1.0], "val_losses": [], "epoch_times": [],
            "relative_loss": []}
    path = str(tmp_path / "model.ckpt")
    save_checkpoint(path, params, opt_state, hist, backend="orbax")
    assert (tmp_path / "model.ckpt").is_dir()
    save_checkpoint(path, params, opt_state, hist, backend="msgpack")
    assert (tmp_path / "model.ckpt").is_file()
    p2, _, h2 = load_checkpoint(path, params, opt_state)
    _assert_trees_equal(params, p2)
    assert h2["train_losses"] == [1.0]


def test_orbax_save_never_leaves_run_without_checkpoint(tmp_path):
    """The orbax save writes to a side dir first: until the final swap, the
    previous checkpoint file remains loadable (no whole-save crash window)."""
    import os
    _, params, _, opt_state = _model_and_state()
    hist = {"train_losses": [1.0], "val_losses": [], "epoch_times": [],
            "relative_loss": []}
    path = str(tmp_path / "model.ckpt")
    save_checkpoint(path, params, opt_state, hist, backend="msgpack")
    # simulate the state right before the swap: side dir fully written
    import orbax.checkpoint as ocp
    from flax import serialization
    with ocp.PyTreeCheckpointer() as ck:
        ck.save(os.path.abspath(path) + ".tmp_orbax",
                {"model_state_dict": serialization.to_state_dict(params)})
    # the original msgpack checkpoint is still intact and loadable
    assert (tmp_path / "model.ckpt").is_file()
    p2, _, _ = load_checkpoint(path, params, opt_state)
    _assert_trees_equal(params, p2)

"""Trainer / checkpoint / run_experiment tests (on CPU)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from njode_tpu import NeuralJumpODE
from njode_tpu.simulation import simulate_batch
from njode_tpu.utils import (Trainer, create_data_loaders, make_adam,
                             run_experiment)

TINY = dict(
    experiment_name="test_bs",
    input_dim=1, hidden_dim=8, output_dim=1,
    n_hidden_layers=1, activation="relu", dropout_rate=0.0,
    input_scaling="identity", variance_method="direct", dt_ode_step=None,
    learning_rate=1e-2, weight_decay=5e-4, n_epochs=4, batch_size=8,
    shuffle=True, print_every=2, device="auto", ignore_first_continuity=True,
    num_moments=2, moment_weights=[1.0, 10.0], shared_network=False,
    data=dict(process_type="black_scholes", n_train=16, n_val=8,
              obs_fraction=0.1, cache_data=True, mu=0.1, sigma=0.5,
              T=1.0, n_steps=50, x0=1.0),
)


def test_adam_matches_torch(torch_reference):
    """make_adam must replicate torch.optim.Adam(lr, weight_decay) updates."""
    import torch
    w0 = np.random.default_rng(0).normal(size=(4, 3)).astype(np.float32)
    grads = [np.random.default_rng(i + 1).normal(size=(4, 3)).astype(np.float32)
             for i in range(5)]

    tw = torch.nn.Parameter(torch.tensor(w0.copy()))
    topt = torch.optim.Adam([tw], lr=1e-2, weight_decay=0.1)
    for g in grads:
        topt.zero_grad()
        tw.grad = torch.tensor(g)
        topt.step()

    tx = make_adam(1e-2, 0.1)
    p = {"w": jnp.asarray(w0)}
    s = tx.init(p)
    for g in grads:
        u, s = tx.update({"w": jnp.asarray(g)}, s, p)
        import optax
        p = optax.apply_updates(p, u)

    np.testing.assert_allclose(np.asarray(p["w"]), tw.detach().numpy(),
                               rtol=1e-5, atol=2e-6)


def test_flat_adam_matches_optax_chain():
    """make_adam's default flat (raveled) math must match the per-leaf optax
    chain under jit (bit-identical without weight decay; with weight decay,
    XLA's fma fusion of g + wd*p may differ by ~1 ulp), with the exact same
    state pytree structure (the checkpoint format and the whole-run
    kernel's state conversion both depend on it)."""
    import optax
    rng = np.random.default_rng(7)
    # every leaf ravel-friendly (trailing dim 1-D / >= 8) so the flat math
    # itself runs — trees with tiny trailing dims delegate to the chain
    # (test_flat_adam_delegates_on_tiny_trailing_dims below)
    params = {"a": {"w": jnp.asarray(rng.normal(size=(5, 8)), jnp.float32),
                    "b": jnp.asarray(rng.normal(size=(3,)), jnp.float32)},
              "c": jnp.asarray(rng.normal(size=(2, 2, 8)), jnp.float32)}
    gs = [jax.tree_util.tree_map(
        lambda x: jnp.asarray(rng.normal(size=x.shape), jnp.float32), params)
        for _ in range(4)]

    def run(tx, p, gs):
        s = tx.init(p)
        for g in gs:
            u, s = tx.update(g, s, p)
            p = optax.apply_updates(p, u)
        return p, s

    for wd in (0.0, 0.01):
        flat_tx = make_adam(1e-2, wd, flat=True)
        tree_tx = make_adam(1e-2, wd, flat=False)
        assert (jax.tree_util.tree_structure(flat_tx.init(params))
                == jax.tree_util.tree_structure(tree_tx.init(params)))
        pf, sf = jax.jit(lambda p, g: run(flat_tx, p, g))(params, gs)
        pt, st = jax.jit(lambda p, g: run(tree_tx, p, g))(params, gs)
        for lf, lt in zip(jax.tree_util.tree_leaves((pf, sf)),
                          jax.tree_util.tree_leaves((pt, st))):
            if wd == 0.0:
                np.testing.assert_array_equal(np.asarray(lf), np.asarray(lt))
            else:
                np.testing.assert_allclose(np.asarray(lf), np.asarray(lt),
                                           atol=1e-8, rtol=1e-6)


def test_flat_adam_delegates_on_tiny_trailing_dims():
    """A tree with a non-trivial trailing dim < 8 (the d_y=2 model's
    (K, d_y) bias / (K, H, d_y) readout shapes) must route make_adam's
    flat update through the per-leaf chain: the raveled scan body
    compiles to a ~0.8 ms/step program for such leaves on TPU
    (BENCH_NOTES.md r5h) while the chain stays free.  Updates and state
    must be bit-identical to flat=False."""
    import optax
    from njode_tpu.utils.training import _flat_ravel_friendly
    rng = np.random.default_rng(11)

    assert _flat_ravel_friendly(
        {"w": jnp.zeros((2, 51, 50)), "b": jnp.zeros((2, 50)),
         "o": jnp.zeros((2, 256, 1)), "b2": jnp.zeros((2, 1))})
    for bad in ((2, 2), (2, 256, 2), (4, 4)):
        assert not _flat_ravel_friendly({"x": jnp.zeros(bad)})

    params = {"w": jnp.asarray(rng.normal(size=(2, 256, 2)), jnp.float32),
              "b": jnp.asarray(rng.normal(size=(2, 2)), jnp.float32)}
    gs = [jax.tree_util.tree_map(
        lambda x: jnp.asarray(rng.normal(size=x.shape), jnp.float32), params)
        for _ in range(3)]

    def run(tx, p, gs):
        s = tx.init(p)
        for g in gs:
            u, s = tx.update(g, s, p)
            p = optax.apply_updates(p, u)
        return p, s

    for wd in (0.0, 5e-4):
        flat_tx = make_adam(1e-2, wd, flat=True)
        tree_tx = make_adam(1e-2, wd, flat=False)
        pf, sf = jax.jit(lambda p, g: run(flat_tx, p, g))(params, gs)
        pt, st = jax.jit(lambda p, g: run(tree_tx, p, g))(params, gs)
        for lf, lt in zip(jax.tree_util.tree_leaves((pf, sf)),
                          jax.tree_util.tree_leaves((pt, st))):
            np.testing.assert_array_equal(np.asarray(lf), np.asarray(lt))


def test_trainer_loss_decreases(tmp_path):
    model = NeuralJumpODE(input_dim=1, hidden_dim=16, output_dim=1,
                          num_moments=2)
    trainer = Trainer(model, make_adam(1e-2, 0.0),
                      ignore_first_continuity=True,
                      moment_weights=[1.0, 10.0])
    batch = simulate_batch(jax.random.PRNGKey(0), 32, "black_scholes",
                           obs_fraction=0.1, mu=0.1, sigma=0.5)
    l0 = trainer.train_epoch(batch.times, batch.values, batch_size=None)
    for _ in range(60):
        l = trainer.train_epoch(batch.times, batch.values, batch_size=None)
    assert l < l0 * 0.2


def test_minibatch_partial_batch():
    """n not divisible by batch_size: padded minibatch must be masked."""
    model = NeuralJumpODE(input_dim=1, hidden_dim=8, output_dim=1)
    trainer = Trainer(model, make_adam(1e-3))
    batch = simulate_batch(jax.random.PRNGKey(0), 10, "black_scholes", 0.1)
    loss = trainer.train_epoch(batch.times, batch.values, batch_size=4)
    assert np.isfinite(loss)


def test_run_experiment_and_resume(tmp_path, capsys):
    cfg = json.loads(json.dumps(TINY))
    res = run_experiment(cfg, save_dir=str(tmp_path))
    h = res["history"]
    assert len(h["train_loss"]) == 4
    assert len(h["val_loss"]) == 4
    assert len(h["relative_loss"]) == 2  # epochs 0 and 2
    assert all(np.isfinite(x) for x in h["train_loss"])
    d = tmp_path / "test_bs"
    assert (d / "config.json").exists()
    assert (d / "history.json").exists()
    assert (d / "model.ckpt").exists()

    # resume: already complete -> early return with full histories
    res2 = run_experiment(cfg, save_dir=str(tmp_path))
    assert res2["history"].get("resumed_from_checkpoint") is True
    assert len(res2["history"]["train_loss"]) == 4

    # extend: continues from epoch 4
    cfg["n_epochs"] = 6
    res3 = run_experiment(cfg, save_dir=str(tmp_path))
    assert len(res3["history"]["train_loss"]) == 6
    # first 4 entries preserved from the checkpoint
    np.testing.assert_allclose(res3["history"]["train_loss"][:4],
                               h["train_loss"], rtol=1e-6)


def test_corrupt_checkpoint_degrades_to_fresh(tmp_path):
    cfg = json.loads(json.dumps(TINY))
    cfg["n_epochs"] = 2
    run_experiment(cfg, save_dir=str(tmp_path))
    # corrupt the checkpoint
    with open(tmp_path / "test_bs" / "model.ckpt", "wb") as f:
        f.write(b"garbage")
    res = run_experiment(cfg, save_dir=str(tmp_path))
    assert len(res["history"]["train_loss"]) == 2  # trained fresh


def test_data_loader_cache_and_fresh():
    train_fn, val_fn = create_data_loaders(
        process_type="black_scholes", n_train=4, n_val=2, obs_fraction=0.1,
        cache_data=True, mu=0.1, sigma=0.5)
    a, b = train_fn(0), train_fn(1)
    np.testing.assert_array_equal(np.asarray(a.values), np.asarray(b.values))

    train_fn2, _ = create_data_loaders(
        process_type="black_scholes", n_train=4, n_val=2, obs_fraction=0.1,
        cache_data=False, mu=0.1, sigma=0.5)
    c, d = train_fn2(0), train_fn2(1)
    # genuinely fresh paths per epoch (fixes the reference's seed=i quirk)
    assert not np.array_equal(np.asarray(c.values), np.asarray(d.values))
    # but deterministic per (seed, epoch)
    e = train_fn2(0)
    np.testing.assert_array_equal(np.asarray(c.values), np.asarray(e.values))


def test_ragged_closure_data_fn():
    """Reference-style closures returning ragged lists still work."""
    from njode_tpu.simulation import create_trajectory_batch
    model = NeuralJumpODE(input_dim=1, hidden_dim=8, output_dim=1)
    trainer = Trainer(model, make_adam(1e-3))

    def data_fn():
        return create_trajectory_batch(4, "black_scholes", obs_fraction=0.1,
                                       mu=0.1, sigma=0.5)

    hist = trainer.train(data_fn, data_fn, n_epochs=2, batch_size=None,
                         print_every=1)
    assert len(hist["train_loss"]) == 2

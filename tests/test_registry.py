"""Custom-process registry: plug in a user SDE end to end."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from njode_tpu.simulation import (register_process, registered_processes,
                                  simulate_batch)
from njode_tpu.simulation.moments import moments_at_obs
from njode_tpu.utils import Trainer, make_adam, create_data_loaders
from njode_tpu import NeuralJumpODE


def _bm_paths(key, n_paths, sigma=1.0, T=1.0, n_steps=50, x0=0.0):
    """Plain Brownian motion — the simplest possible custom process."""
    dt = T / n_steps
    times = jnp.linspace(0.0, T, n_steps + 1)
    dW = sigma * jnp.sqrt(dt) * jax.random.normal(key, (n_paths, n_steps))
    X = x0 + jnp.concatenate(
        [jnp.zeros((n_paths, 1)), jnp.cumsum(dW, axis=1)], axis=1)
    return times, X


def _bm_moments(times, values, num_moments=1, variance_method="direct",
                sigma=1.0, **_):
    """E[X_t|X_s] = X_s ; Var = sigma^2 (t - s)."""
    B, N, d = values.shape
    dt = jnp.concatenate(
        [jnp.zeros((B, 1)), times[:, 1:] - times[:, :-1]], axis=1)[..., None]
    prev = jnp.concatenate([values[:, :1], values[:, :-1]], axis=1)
    first = jnp.zeros((B, N, 1)).at[:, 0].set(1.0) > 0
    mean_b = jnp.where(first, values, prev)
    var_b = jnp.where(first, 0.0, jnp.broadcast_to(sigma ** 2 * dt,
                                                   prev.shape))
    m = [values]
    mb = [mean_b]
    if num_moments > 1:
        if variance_method == "second_moment":
            m.append(values ** 2)          # E[X^2] after jump: X known
            mb.append(var_b + mean_b ** 2)
        else:
            m.append(jnp.zeros_like(values))
            mb.append(var_b)
    return jnp.stack(m, -1), jnp.stack(mb, -1)


register_process("brownian", _bm_paths, moments_fn=_bm_moments)


def test_registered_process_simulates():
    assert "brownian" in registered_processes()
    b = simulate_batch(jax.random.PRNGKey(0), 8, "brownian", 0.1,
                       sigma=0.5, T=1.0, n_steps=50, x0=0.0)
    assert b.times.shape[0] == 8
    X = np.asarray(b.paths)
    assert abs(X[:, -1].mean()) < 0.5
    # statistics follow the law
    b2 = simulate_batch(jax.random.PRNGKey(1), 4000, "brownian", 0.1,
                        sigma=0.5, T=1.0, n_steps=50, x0=0.0)
    XT = np.asarray(b2.paths[:, -1])
    assert abs(XT.var() - 0.25) < 0.03


def test_registered_moments_and_training():
    b = simulate_batch(jax.random.PRNGKey(0), 8, "brownian", 0.1, sigma=0.5)
    m, mb = moments_at_obs(b.times, b.values, "brownian", num_moments=2,
                           sigma=0.5)
    np.testing.assert_allclose(np.asarray(m[..., 0]), np.asarray(b.values),
                               rtol=1e-6)

    model = NeuralJumpODE(input_dim=1, hidden_dim=8, output_dim=1,
                          num_moments=2)
    trainer = Trainer(model, make_adam(1e-2), moment_weights=[1.0, 10.0])
    train_fn, val_fn = create_data_loaders(
        process_type="brownian", n_train=8, n_val=4, obs_fraction=0.1,
        cache_data=True, sigma=0.5)
    hist = trainer.train(
        train_fn, val_fn, n_epochs=2, print_every=1,
        config={"data": {"process_type": "brownian", "sigma": 0.5}})
    assert len(hist["train_loss"]) == 2
    assert len(hist["relative_loss"]) == 2
    assert all(np.isfinite(x) for x in hist["relative_loss"])

"""Serving APIs: batched predict_at + online NJODEFilter."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from njode_tpu import NeuralJumpODE
from njode_tpu.serving import NJODEFilter
from njode_tpu.simulation import simulate_batch


@pytest.fixture(scope="module")
def setup():
    model = NeuralJumpODE(input_dim=1, hidden_dim=16, output_dim=1,
                          num_moments=2)
    params = model.init(jax.random.PRNGKey(0))
    batch = simulate_batch(jax.random.PRNGKey(1), 4, "black_scholes", 0.1,
                           n_steps=50)
    return model, params, batch


def test_predict_at_matches_forward(setup):
    """Queries at observation times give the after-jump predictions; queries
    just before give the before-jump ones."""
    model, params, b = setup
    preds, preds_before = model.apply(params, b.times, b.values, b.mask)

    out_at = model.predict_at(params, b.times, b.values, b.times, b.mask)
    np.testing.assert_allclose(np.asarray(out_at["raw"]), np.asarray(preds),
                               rtol=1e-5, atol=1e-6)

    eps = 1e-6
    out_before = model.predict_at(params, b.times, b.values,
                                  b.times - eps, b.mask)
    # slot 0 - eps lies before the first observation -> zeros, like forward
    np.testing.assert_allclose(np.asarray(out_before["raw"]),
                               np.asarray(preds_before), rtol=1e-3,
                               atol=1e-4)


def test_predict_at_before_first_obs(setup):
    model, params, b = setup
    q = jnp.full((4, 3), -0.5)
    out = model.predict_at(params, b.times, b.values, q, b.mask)
    assert np.all(np.asarray(out["raw"]) == 0.0)


def test_predict_at_fixed_dt_substeps():
    model = NeuralJumpODE(input_dim=1, hidden_dim=8, output_dim=1,
                          num_moments=2, dt_ode_step=0.03, t_max=1.0)
    params = model.init(jax.random.PRNGKey(0))
    b = simulate_batch(jax.random.PRNGKey(1), 2, "black_scholes", 0.1,
                       n_steps=20)
    preds, _ = model.apply(params, b.times, b.values, b.mask)
    out = model.predict_at(params, b.times, b.values, b.times, b.mask)
    np.testing.assert_allclose(np.asarray(out["raw"]), np.asarray(preds),
                               rtol=1e-5, atol=1e-6)


def test_online_filter_matches_batch(setup):
    """Streaming update/predict reproduces the batched forward exactly."""
    model, params, b = setup
    f = NJODEFilter(model, params)
    state = f.init_state(4)
    N = b.times.shape[1]
    preds, preds_before = model.apply(params, b.times, b.values, b.mask)

    for i in range(N):
        if i > 0:
            # before-jump prediction at t_i from the state after obs i-1
            out = f.predict(state, b.times[:, i])
            np.testing.assert_allclose(np.asarray(out["raw"]),
                                       np.asarray(preds_before[:, i]),
                                       rtol=1e-5, atol=1e-6)
        state = f.update(state, b.times[:, i], b.values[:, i])
        out = f.predict(state, b.times[:, i])
        np.testing.assert_allclose(np.asarray(out["raw"]),
                                   np.asarray(preds[:, i]),
                                   rtol=1e-5, atol=1e-6)


def test_filter_unseen_streams_predict_zero(setup):
    model, params, _ = setup
    f = NJODEFilter(model, params)
    state = f.init_state(3)
    out = f.predict(state, jnp.asarray([0.5, 0.5, 0.5]))
    assert np.all(np.asarray(out["raw"]) == 0.0)
    # masked update: only stream 0 ingests
    state = f.update(state, jnp.asarray([0.1] * 3),
                     jnp.ones((3, 1)), obs_mask=jnp.asarray([True, False,
                                                             False]))
    out = f.predict(state, jnp.asarray([0.5] * 3))
    r = np.asarray(out["raw"])
    assert np.any(r[0] != 0.0)
    assert np.all(r[1:] == 0.0)

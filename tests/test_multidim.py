"""Multi-dimensional correlated processes (simulation/multidim.py).

Capability beyond the reference (whose simulators are 1-D,
reference simulation/data_generation.py:11-218): correlated d-dim GBM and
OU generators, their analytic conditional moments, and full integration with
simulate_batch / training / the relative-loss metric.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from njode_tpu.simulation import (
    bs_paths_nd,
    ou_paths_nd,
    simulate_batch,
)
from njode_tpu.simulation.moments import moments_at_obs_jit
from njode_tpu.simulation.multidim import bs_nd_moments, ou_nd_moments

CORR = [[1.0, 0.8], [0.8, 1.0]]


def test_bs_nd_law():
    """Marginals are lognormal with the right mean; correlation is honored."""
    key = jax.random.PRNGKey(0)
    mu, sigma = [0.1, 0.05], [0.5, 0.3]
    times, X = bs_paths_nd(key, 20000, dims=2, mu=mu, sigma=sigma, corr=CORR,
                           T=1.0, n_steps=50)
    X = np.asarray(X)
    assert X.shape == (20000, 51, 2)
    assert np.allclose(X[:, 0], [1.0, 1.0])
    # E[X_T] = x0 exp(mu T)
    np.testing.assert_allclose(X[:, -1].mean(0), np.exp(mu), rtol=0.02)
    lr = np.diff(np.log(X), axis=1)
    emp = np.corrcoef(lr[..., 0].ravel(), lr[..., 1].ravel())[0, 1]
    assert abs(emp - 0.8) < 0.02
    # per-step log-return variance = sigma_j^2 dt
    np.testing.assert_allclose(lr.var(axis=(0, 1)),
                               np.asarray(sigma) ** 2 / 50, rtol=0.05)


def test_ou_nd_exact_discretization():
    """Terminal mean/variance match the OU closed forms exactly in law."""
    key = jax.random.PRNGKey(1)
    th, mu, sg, x0 = [1.0, 2.0], [0.5, -0.5], [0.3, 0.4], [0.0, 1.0]
    times, X = ou_paths_nd(key, 20000, dims=2, theta=th, mu=mu, sigma=sg,
                           corr=CORR, T=1.0, n_steps=50, x0=x0)
    X = np.asarray(X)
    th_, mu_, sg_, x0_ = map(np.asarray, (th, mu, sg, x0))
    exp_mean = x0_ * np.exp(-th_) + mu_ * (1 - np.exp(-th_))
    exp_var = sg_ ** 2 / (2 * th_) * (1 - np.exp(-2 * th_))
    np.testing.assert_allclose(X[:, -1].mean(0), exp_mean, atol=0.01)
    np.testing.assert_allclose(X[:, -1].var(0), exp_var, rtol=0.05)


def test_ou_nd_uncorrelated_matches_1d_law():
    """corr=None components are independent 1-D OUs (cross-corr ~ 0)."""
    key = jax.random.PRNGKey(2)
    _, X = ou_paths_nd(key, 8000, dims=2, theta=1.0, mu=0.0, sigma=0.3,
                       T=1.0, n_steps=40, x0=0.0)
    X = np.asarray(X)
    inc = np.diff(X, axis=1)
    emp = np.corrcoef(inc[..., 0].ravel(), inc[..., 1].ravel())[0, 1]
    assert abs(emp) < 0.02


def test_simulate_batch_nd_shapes():
    batch = simulate_batch(jax.random.PRNGKey(3), 16, "black_scholes_nd",
                           obs_fraction=0.1, dims=3, mu=0.1, sigma=0.4,
                           n_steps=100)
    assert batch.values.shape == (16, 10, 3)
    assert batch.paths.shape == (16, 101, 3)
    # observed values equal the path at the observed grid indices
    b = np.asarray(batch.paths)[
        np.arange(16)[:, None], np.asarray(batch.obs_idx)]
    np.testing.assert_array_equal(np.asarray(batch.values), b)


@pytest.mark.parametrize("variance_method", ["direct", "second_moment"])
def test_nd_moments_formulas(variance_method):
    """Before-jump truths match hand-computed componentwise closed forms."""
    key = jax.random.PRNGKey(4)
    mu, sigma = [0.1, 0.05], [0.5, 0.3]
    batch = simulate_batch(key, 6, "black_scholes_nd", obs_fraction=0.1,
                           dims=2, mu=mu, sigma=sigma, corr=CORR)
    m, mb = moments_at_obs_jit(batch.times, batch.values, "black_scholes_nd",
                               num_moments=2, variance_method=variance_method,
                               mask=batch.mask, dims=2, mu=mu, sigma=sigma,
                               corr=CORR)
    assert m.shape == batch.values.shape + (2,)
    t, v = np.asarray(batch.times), np.asarray(batch.values)
    dt = (t[:, 1:] - t[:, :-1])[..., None]
    prev = v[:, :-1]
    mean_b = prev * np.exp(np.asarray(mu) * dt)
    var_b = prev ** 2 * (np.exp(np.asarray(sigma) ** 2 * dt) - 1.0) \
        * np.exp(2.0 * np.asarray(mu) * dt)
    np.testing.assert_allclose(np.asarray(mb)[:, 1:, :, 0], mean_b,
                               rtol=1e-5, atol=1e-6)
    if variance_method == "direct":
        np.testing.assert_allclose(np.asarray(mb)[:, 1:, :, 1], var_b,
                                   rtol=1e-4, atol=1e-6)
    else:
        np.testing.assert_allclose(np.asarray(mb)[:, 1:, :, 1],
                                   var_b + mean_b ** 2, rtol=1e-4, atol=1e-6)
    # after-jump: observation / variance 0 (second_moment: X^2)
    np.testing.assert_allclose(np.asarray(m)[..., 0], v, rtol=1e-6)


def test_ou_nd_moments_theta_zero():
    """theta -> 0 component degrades to Brownian variance sigma^2 dt."""
    times = jnp.asarray([[0.0, 0.5, 1.0]])
    values = jnp.ones((1, 3, 2))
    m, mb = ou_nd_moments(times, values, num_moments=2,
                          theta=[0.0, 1.0], mu=0.0, sigma=[0.3, 0.3])
    np.testing.assert_allclose(np.asarray(mb)[0, 1, 0, 1], 0.09 * 0.5,
                               rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(mb)[0, 1, 1, 1],
        0.09 / 2.0 * (1 - np.exp(-2 * 0.5)), rtol=1e-5)


def test_nd_end_to_end_training():
    """2-D OU trains through run_experiment; loss decreases, rel loss finite."""
    import tempfile

    from njode_tpu.utils.training import run_experiment

    config = {
        "experiment_name": "nd_e2e",
        "input_dim": 2, "hidden_dim": 16, "output_dim": 2,
        "num_moments": 2, "n_hidden_layers": 1, "activation": "tanh",
        "learning_rate": 1e-2, "weight_decay": 0.0,
        "n_epochs": 12, "batch_size": 32, "print_every": 4,
        "moment_weights": [1.0, 10.0],
        "data": {
            "process_type": "ornstein_uhlenbeck_nd",
            "n_train": 64, "n_val": 16, "obs_fraction": 0.1,
            "cache_data": True, "dims": 2,
            "theta": [1.0, 2.0], "mu": [0.5, -0.5], "sigma": [0.3, 0.4],
            "corr": [[1.0, 0.5], [0.5, 1.0]],
            "T": 1.0, "n_steps": 100, "x0": [0.0, 1.0],
        },
    }
    with tempfile.TemporaryDirectory() as d:
        res = run_experiment(config, save_dir=d)
        h = res["history"]
        tl = h["train_loss"]
        assert tl[-1] < tl[0]
        rl = [r for r in h["relative_loss"] if r == r]
        assert rl, "relative loss should be computable for nd processes"
        assert rl[-1] < rl[0]

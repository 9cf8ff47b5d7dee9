"""Simulator tests: shape/ordering invariants + statistical parity with the
analytic process laws (SURVEY.md §7 step-1 checkpoint)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from njode_tpu.simulation import (
    bs_paths, create_trajectory_batch, generate_black_scholes, heston_paths,
    hybrid_ou_bs_paths, n_obs_for, ou_paths, sample_obs_indices,
    simulate_batch, subsample_random_grid_points)


def test_grid_and_shapes():
    times, X = bs_paths(jax.random.PRNGKey(0), 16, mu=0.1, sigma=0.2,
                        T=1.0, n_steps=100, x0=1.0)
    assert times.shape == (101,)
    assert X.shape == (16, 101)
    assert float(times[0]) == 0.0 and abs(float(times[-1]) - 1.0) < 1e-6
    assert np.all(np.asarray(X[:, 0]) == 1.0)


def test_bs_statistics():
    """E[X_T] = x0 e^{mu T}, Var[X_T] = x0^2 e^{2 mu T}(e^{sigma^2 T}-1)."""
    mu, sigma, T, x0 = 0.1, 0.3, 1.0, 1.0
    _, X = bs_paths(jax.random.PRNGKey(0), 20000, mu=mu, sigma=sigma, T=T,
                    n_steps=50, x0=x0)
    XT = np.asarray(X[:, -1])
    m_true = x0 * np.exp(mu * T)
    v_true = x0 ** 2 * np.exp(2 * mu * T) * (np.exp(sigma ** 2 * T) - 1)
    assert abs(XT.mean() - m_true) < 4 * XT.std() / np.sqrt(len(XT))
    assert abs(XT.var() - v_true) < 0.1 * v_true


def test_ou_statistics():
    """Exact discretization: X_T ~ N(x0 e^{-thT} + mu(1-e^{-thT}),
    sigma^2/(2th)(1-e^{-2thT})) for any n_steps."""
    th, mu, sigma, T, x0 = 2.0, 0.5, 0.3, 1.0, -1.0
    _, X = ou_paths(jax.random.PRNGKey(0), 20000, theta=th, mu=mu,
                    sigma=sigma, T=T, n_steps=10, x0=x0)
    XT = np.asarray(X[:, -1])
    m_true = x0 * np.exp(-th * T) + mu * (1 - np.exp(-th * T))
    v_true = sigma ** 2 / (2 * th) * (1 - np.exp(-2 * th * T))
    assert abs(XT.mean() - m_true) < 4 * np.sqrt(v_true / len(XT))
    assert abs(XT.var() - v_true) < 0.05 * v_true


def test_ou_theta_zero():
    """theta=0 falls back to Brownian motion (reference :84)."""
    _, X = ou_paths(jax.random.PRNGKey(0), 5000, theta=0.0, mu=0.5,
                    sigma=0.4, T=1.0, n_steps=20, x0=0.0)
    XT = np.asarray(X[:, -1])
    assert abs(XT.mean()) < 0.03          # no drift toward mu when theta=0
    assert abs(XT.var() - 0.16) < 0.02    # sigma^2 T


def test_heston_clamps_and_mean():
    times, X, V = heston_paths(jax.random.PRNGKey(0), 5000, mu=0.5,
                               kappa=2.0, theta=0.04, xi=0.5, rho=-0.5,
                               T=1.0, n_steps=100, x0=1.0, v0=0.04)
    assert np.all(np.asarray(V) >= 1e-6 - 1e-9)
    XT = np.asarray(X[:, -1])
    # E[X_T] = x0 e^{mu T} regardless of vol process
    assert abs(XT.mean() - np.exp(0.5)) < 5 * XT.std() / np.sqrt(len(XT))


def test_hybrid_continuity_and_switch():
    times, X, sw = hybrid_ou_bs_paths(jax.random.PRNGKey(0), 1000,
                                      theta_ou=1.0, mu_ou=0.5, sigma_ou=0.3,
                                      mu_bs=0.1, sigma_bs=0.2, T=1.0,
                                      n_steps=100, x0=1.0)
    assert np.all((np.asarray(sw) >= 0.2) & (np.asarray(sw) <= 0.8))
    assert np.all(np.isfinite(np.asarray(X)))
    # fixed switch time honoured
    _, _, sw2 = hybrid_ou_bs_paths(jax.random.PRNGKey(1), 10,
                                   switch_time=0.5, x0=1.0)
    assert np.allclose(np.asarray(sw2), 0.5)


def test_obs_subsampling_invariants():
    n_grid = 101
    idx = sample_obs_indices(jax.random.PRNGKey(0), 64, n_grid, 0.1)
    assert idx.shape == (64, n_obs_for(0.1, n_grid))
    arr = np.asarray(idx)
    assert np.all(arr[:, 0] == 0)
    assert np.all(arr[:, -1] == n_grid - 1)
    assert np.all(np.diff(arr, axis=1) > 0)  # sorted, no duplicates
    # different rows differ (random per-trajectory)
    assert not np.all(arr[0] == arr[1])


def test_obs_subsampling_law_floyd_vs_topk():
    """The two subset samplers (Floyd for sparse k, top-k-of-uniform for
    dense) draw from the SAME uniform-without-replacement law: every
    interior index has inclusion probability k/m, and both samplers'
    empirical marginals agree within binomial error."""
    from njode_tpu.simulation.sde import _floyd_subset
    B, m, k = 20000, 98, 8
    fl = np.asarray(_floyd_subset(jax.random.PRNGKey(0), B, m, k))
    assert fl.shape == (B, k)
    # distinct within each row
    assert all(len(set(r)) == k for r in fl[:200])
    counts = np.bincount(fl.ravel(), minlength=m)
    p = counts / (B * k)                      # mean 1/m under uniformity
    # 4-sigma band on the per-index inclusion frequency
    se = np.sqrt((1 / m) * (1 - 1 / m) / (B * k))
    assert np.all(np.abs(p - 1 / m) < 4 * se), (p.min(), p.max())
    # dense path (top_k) still honors the invariants
    idx = sample_obs_indices(jax.random.PRNGKey(1), 64, 101, 0.5)
    arr = np.asarray(idx)
    assert np.all(arr[:, 0] == 0) and np.all(arr[:, -1] == 100)
    assert np.all(np.diff(arr, axis=1) > 0)


def test_single_path_reference_api():
    times, X = generate_black_scholes(mu=0.1, sigma=0.2, seed=3)
    assert times.shape == (101,) and X.shape == (101,)
    t2, v2 = subsample_random_grid_points(times, X, 0.1, seed=3)
    assert t2.shape[0] == n_obs_for(0.1, 101)
    assert float(t2[0]) == 0.0


def test_create_trajectory_batch_reference_api():
    """Reference test_basic.py:144-169: lengths, t[0]==0, strictly sorted."""
    bt, bv = create_trajectory_batch(5, "black_scholes", obs_fraction=0.1,
                                     mu=0.1, sigma=0.2)
    assert len(bt) == len(bv) == 5
    for t, v in zip(bt, bv):
        assert t.shape[0] == v.shape[0]
        assert v.shape[1] == 1
        assert float(t[0]) == 0.0
        assert np.all(np.diff(np.asarray(t)) > 0)


def test_simulate_batch_determinism():
    b1 = simulate_batch(jax.random.PRNGKey(5), 4, "black_scholes", 0.1)
    b2 = simulate_batch(jax.random.PRNGKey(5), 4, "black_scholes", 0.1)
    b3 = simulate_batch(jax.random.PRNGKey(6), 4, "black_scholes", 0.1)
    np.testing.assert_array_equal(np.asarray(b1.values), np.asarray(b2.values))
    assert not np.array_equal(np.asarray(b1.values), np.asarray(b3.values))

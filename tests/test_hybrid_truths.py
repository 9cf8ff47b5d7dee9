"""Hybrid relative-loss ground truths: reference behaviour vs the exact
per-path improvement."""

import json

import numpy as np
import pytest

import jax

from njode_tpu.simulation import simulate_batch
from njode_tpu.simulation.moments import moments_at_obs
from njode_tpu.utils import run_experiment


def test_random_switch_defaults_to_zero_truths():
    """switch_time=None with no per-path record: truths are zeros, matching
    the reference's 'disable relative loss' convention
    (reference data_generation.py:854-858)."""
    b = simulate_batch(jax.random.PRNGKey(0), 4, "hybrid_ou_bs", 0.1)
    m, mb = moments_at_obs(b.times, b.values, "hybrid_ou_bs", num_moments=2,
                           switch_time=None)
    assert np.all(np.asarray(m) == 0)
    assert np.all(np.asarray(mb) == 0)


def test_per_path_switch_times_give_real_truths():
    """With the recorded per-path switch times, truths are exact."""
    b = simulate_batch(jax.random.PRNGKey(0), 4, "hybrid_ou_bs", 0.1)
    assert b.switch_times is not None
    m, mb = moments_at_obs(b.times, b.values, "hybrid_ou_bs", num_moments=2,
                           switch_times=b.switch_times,
                           theta_ou=1.0, mu_ou=0.0, sigma_ou=0.3,
                           mu_bs=0.0, sigma_bs=0.2)
    # after-jump mean truth is the observation itself
    np.testing.assert_allclose(np.asarray(m[..., 0]), np.asarray(b.values),
                               rtol=1e-6)
    assert not np.all(np.asarray(mb) == 0)


def test_exact_hybrid_truths_config(tmp_path):
    """run_experiment with exact_hybrid_truths records a finite relative
    loss for random switch times (the reference cannot)."""
    cfg = dict(
        experiment_name="hyb", input_dim=1, hidden_dim=8, output_dim=1,
        learning_rate=1e-2, weight_decay=0.0, n_epochs=2, batch_size=None,
        print_every=1, num_moments=2, moment_weights=[1.0, 10.0],
        ignore_first_continuity=True, exact_hybrid_truths=True,
        data=dict(process_type="hybrid_ou_bs", n_train=8, n_val=4,
                  obs_fraction=0.1, cache_data=True, theta_ou=1.0,
                  mu_ou=0.5, sigma_ou=0.3, mu_bs=0.1, sigma_bs=0.2,
                  switch_time=None, T=1.0, n_steps=30, x0=1.0))
    res = run_experiment(cfg, save_dir=str(tmp_path))
    rl = res["history"]["relative_loss"]
    assert len(rl) == 2
    assert all(np.isfinite(x) for x in rl)

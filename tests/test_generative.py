"""Generative sampling (njode_tpu.generative) — beyond the reference.

A trained NJ-ODE learns the conditional mean/variance of the process; the
moment-matched autoregressive sampler should therefore reproduce the process
law on the grid.  We train small models briefly on OU / BS and check the
sampled ensembles' moments against the true SDE laws (loose tolerances:
the model itself is only approximately trained).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from njode_tpu import NeuralJumpODE, sample_paths
from njode_tpu.models import nj_ode_loss_dense
from njode_tpu.simulation import simulate_batch


def _train(model, process, steps=600, **pkw):
    params = model.init(jax.random.PRNGKey(0))
    # cosine-decayed Adam: the multi-step law tests compound one-step mean
    # bias ~linearly in the step count, so the fixture models need the
    # last-percent calibration a constant LR leaves on the table
    opt = optax.adam(optax.cosine_decay_schedule(5e-3, steps, 0.02))
    state = opt.init(params)

    @jax.jit
    def step(p, s, k):
        # fresh data each step: one-step means must calibrate across x
        # levels for the autoregressive sampler not to compound bias
        batch = simulate_batch(k, 512, process, obs_fraction=0.1, **pkw)

        def loss_fn(p):
            preds, before = model.apply(p, batch.times, batch.values,
                                        batch.mask)
            return nj_ode_loss_dense(batch.values, preds, before, batch.mask,
                                     moment_weights=(1.0, 10.0))
        l, g = jax.value_and_grad(loss_fn)(p)
        u, s = opt.update(g, s, p)
        return optax.apply_updates(p, u), s, l

    key = jax.random.PRNGKey(1)
    for i in range(steps):
        params, state, l = step(params, state, jax.random.fold_in(key, i))
    return params, float(l)


@pytest.fixture(scope="module")
def ou_model():
    model = NeuralJumpODE(input_dim=1, hidden_dim=32, output_dim=1,
                          num_moments=2, activation="tanh")
    params, _ = _train(model, "ornstein_uhlenbeck",
                       theta=2.0, mu=1.0, sigma=0.4, x0=0.0)
    return model, params


def test_gaussian_sampler_matches_ou_law(ou_model):
    model, params = ou_model
    grid = jnp.linspace(0.0, 1.0, 11)
    samples = sample_paths(model, params, jax.random.PRNGKey(7), 4000,
                           grid, x0=0.0, law="gaussian")
    s = np.asarray(samples)[..., 0]
    assert s.shape == (4000, 11)
    np.testing.assert_array_equal(s[:, 0], 0.0)  # starts at x0 exactly
    th, mu, sg = 2.0, 1.0, 0.4
    t = np.asarray(grid)[1:]
    true_mean = 0.0 * np.exp(-th * t) + mu * (1 - np.exp(-th * t))
    true_var = sg ** 2 / (2 * th) * (1 - np.exp(-2 * th * t))
    # ensemble moments within ~15% of the OU law (model approximation +
    # sampling error); the *shape* over time must track
    np.testing.assert_allclose(s[:, 1:].mean(0), true_mean, atol=0.08)
    np.testing.assert_allclose(s[:, 1:].var(0), true_var,
                               rtol=0.35, atol=0.01)


def test_mean_law_is_deterministic(ou_model):
    model, params = ou_model
    grid = jnp.linspace(0.0, 1.0, 6)
    a = sample_paths(model, params, jax.random.PRNGKey(0), 8, grid,
                     x0=0.5, law="mean")
    b = sample_paths(model, params, jax.random.PRNGKey(99), 8, grid,
                     x0=0.5, law="mean")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # all paths identical (no noise)
    np.testing.assert_allclose(np.asarray(a).std(0), 0.0, atol=1e-6)


@pytest.fixture(scope="module")
def bs_model():
    model = NeuralJumpODE(input_dim=1, hidden_dim=32, output_dim=1,
                          num_moments=2, activation="tanh")
    # 3000 decayed steps: the multi-step law test needs one-step variance
    # calibration across the whole visited x-range (measured: var error
    # 63% @600 steps, 21% @3000)
    params, _ = _train(model, "black_scholes", steps=3000,
                       mu=0.1, sigma=0.4, x0=1.0)
    return model, params


def test_lognormal_sampler_positive_and_one_step_calibrated(bs_model):
    model, params = bs_model
    grid = jnp.linspace(0.0, 1.0, 11)
    samples = sample_paths(model, params, jax.random.PRNGKey(3), 3000,
                           grid, x0=1.0, law="lognormal")
    s = np.asarray(samples)[..., 0]
    assert (s > 0).all()  # lognormal law keeps GBM samples positive

    # ONE-step ensemble moments must match the model's own predictive law
    # exactly (up to MC error) — this pins the sampler mechanics without
    # being sensitive to multi-step compounding of model miscalibration.
    one = sample_paths(model, params, jax.random.PRNGKey(5), 20000,
                       jnp.asarray([0.0, 0.3]), x0=1.0, law="lognormal")
    o = np.asarray(one)[:, 1, 0]
    pred = model.predict_at(params, jnp.zeros((1, 1)), jnp.ones((1, 1, 1)),
                            jnp.asarray([[0.3]]))
    m_pred = float(pred["mean"][0, 0, 0])
    v_pred = float(pred["var"][0, 0, 0])
    np.testing.assert_allclose(o.mean(), m_pred, rtol=0.01)
    np.testing.assert_allclose(o.var(), v_pred, rtol=0.06)


def test_lognormal_sampler_matches_bs_law(bs_model):
    """Multi-step rollout distributional test mirroring the OU one: the
    sampled ensemble's marginal mean/variance track the GBM law."""
    model, params = bs_model
    grid = jnp.linspace(0.0, 1.0, 11)
    samples = sample_paths(model, params, jax.random.PRNGKey(13), 4000,
                           grid, x0=1.0, law="lognormal")
    s = np.asarray(samples)[..., 0]
    np.testing.assert_array_equal(s[:, 0], 1.0)
    mu, sg = 0.1, 0.4
    t = np.asarray(grid)[1:]
    true_mean = np.exp(mu * t)
    true_var = np.exp(2 * mu * t) * (np.exp(sg ** 2 * t) - 1.0)
    np.testing.assert_allclose(s[:, 1:].mean(0), true_mean,
                               rtol=0.06, atol=0.02)
    np.testing.assert_allclose(s[:, 1:].var(0), true_var,
                               rtol=0.35, atol=0.01)


def test_irregular_and_per_path_times(ou_model):
    """Arbitrary target times: non-uniform shared grids follow the law,
    per-path (B, G) time matrices work, and identical rows reproduce the
    shared-grid result exactly."""
    model, params = ou_model
    # gaps stay inside the training-gap support (~obs_fraction
    # spacing); a lone long gap would test extrapolation, not law
    irregular = jnp.asarray([0.0, 0.03, 0.17, 0.3, 0.33, 0.45, 0.58])
    samples = sample_paths(model, params, jax.random.PRNGKey(21), 4000,
                           irregular, x0=0.0, law="gaussian")
    s = np.asarray(samples)[..., 0]
    th, mu, sg = 2.0, 1.0, 0.4
    t = np.asarray(irregular)[1:]
    true_mean = mu * (1 - np.exp(-th * t))
    true_var = sg ** 2 / (2 * th) * (1 - np.exp(-2 * th * t))
    np.testing.assert_allclose(s[:, 1:].mean(0), true_mean, atol=0.08)
    np.testing.assert_allclose(s[:, 1:].var(0), true_var,
                               rtol=0.35, atol=0.01)

    # per-path matrix with identical rows == shared vector, bit-for-bit
    B = 16
    tiled = jnp.tile(irregular[None], (B, 1))
    a = sample_paths(model, params, jax.random.PRNGKey(2), B, irregular,
                     x0=0.0, law="gaussian")
    b = sample_paths(model, params, jax.random.PRNGKey(2), B, tiled,
                     x0=0.0, law="gaussian")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # genuinely different per-path times diverge after t=0
    G = irregular.shape[0]
    jitter = jnp.linspace(0.0, 0.2, B)[:, None] * jnp.concatenate(
        [jnp.zeros((1,)), jnp.ones((G - 1,))])[None]
    c = sample_paths(model, params, jax.random.PRNGKey(2), B,
                     tiled + jitter, x0=0.0, law="mean")
    assert np.asarray(c[:, 1, 0]).std() > 0


def test_sampling_at_obs_only_batch_times(ou_model):
    """A TrajectoryBatch.times matrix from an obs_only batch is a valid
    per-path target-time input (FUTURE.md round-2 item)."""
    model, params = ou_model
    batch = simulate_batch(jax.random.PRNGKey(5), 32, "ornstein_uhlenbeck",
                           0.2, obs_only=True, T=1.0, n_steps=20,
                           theta=2.0, mu=1.0, sigma=0.4, x0=0.0)
    s = sample_paths(model, params, jax.random.PRNGKey(6), 32,
                     batch.times, x0=0.0, law="gaussian")
    assert s.shape == (32, batch.times.shape[1], 1)
    assert np.isfinite(np.asarray(s)).all()
    np.testing.assert_array_equal(np.asarray(s[:, 0, 0]), 0.0)


def test_conditioning_prefix(ou_model):
    """Conditioned sampling starts from the last observation's state."""
    model, params = ou_model
    grid = jnp.linspace(0.5, 1.0, 6)
    obs_t = jnp.asarray([0.0, 0.4])
    obs_v = jnp.asarray([[0.0], [2.0]])  # far above the OU mean of 1.0
    samples = sample_paths(model, params, jax.random.PRNGKey(11), 2000,
                           grid, x0=None, law="gaussian",
                           obs_times=obs_t, obs_values=obs_v)
    s = np.asarray(samples)[..., 0]
    # mean-reverting pull: ensemble mean decreases from ~2 toward 1
    assert s[:, 0].mean() > s[:, -1].mean() > 0.9
    # matches the model's own prediction at the first grid point
    pred = model.predict_at(params, obs_t[None], obs_v[None],
                            grid[:1][None])
    assert abs(s[:, 0].mean() - float(pred["mean"][0, 0, 0])) < 0.05


def test_sampler_validation():
    model1 = NeuralJumpODE(input_dim=1, hidden_dim=8, output_dim=1,
                           num_moments=1)
    p = model1.init(jax.random.PRNGKey(0))
    grid = jnp.linspace(0.0, 1.0, 4)
    with pytest.raises(ValueError):
        sample_paths(model1, p, jax.random.PRNGKey(0), 4, grid, x0=1.0,
                     law="gaussian")
    with pytest.raises(ValueError):
        sample_paths(model1, p, jax.random.PRNGKey(0), 4, grid, x0=1.0,
                     law="cauchy")
    # mean law works for a 1-moment model
    out = sample_paths(model1, p, jax.random.PRNGKey(0), 4, grid, x0=1.0,
                       law="mean")
    assert np.isfinite(np.asarray(out)).all()


def test_x0_shapes(ou_model):
    """x0 accepts scalar, (d_x,), (B,), and (B, d_x) as documented."""
    model, params = ou_model
    grid = jnp.linspace(0.0, 1.0, 4)
    B = 6
    per_path = jnp.linspace(-1.0, 1.0, B)
    for x0 in [0.5, jnp.asarray([0.5]), per_path, per_path[:, None]]:
        s = sample_paths(model, params, jax.random.PRNGKey(0), B, grid,
                         x0=x0, law="mean")
        assert s.shape == (B, 4, 1)
    # per-path values actually differ at t=0
    s = sample_paths(model, params, jax.random.PRNGKey(0), B, grid,
                     x0=per_path, law="mean")
    np.testing.assert_allclose(np.asarray(s[:, 0, 0]), np.asarray(per_path),
                               rtol=1e-6)

"""Exact observation-time sampling (simulate_batch(obs_only=True)).

Pins: same observation times as the grid path for the same key, exact
marginal law (vs closed form AND vs grid-simulate-then-subsample stats),
deterministic t=0 value, unsupported-process error, end-to-end training.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from njode_tpu import NeuralJumpODE, nj_ode_loss
from njode_tpu.simulation import simulate_batch, supports_obs_only
from njode_tpu.utils import make_adam

BS = dict(T=1.0, n_steps=50, mu=0.1, sigma=0.5, x0=1.0)
OU = dict(T=1.0, n_steps=50, theta=1.0, mu=0.5, sigma=0.3, x0=0.0)


HYB = dict(T=1.0, n_steps=50, theta_ou=1.0, mu_ou=0.5, sigma_ou=0.3,
           mu_bs=0.1, sigma_bs=0.2, x0=1.0)


def test_supports():
    assert supports_obs_only("black_scholes")
    assert supports_obs_only("ornstein_uhlenbeck")
    assert supports_obs_only("hybrid_ou_bs")
    assert not supports_obs_only("heston")


def test_same_obs_times_as_grid_mode():
    key = jax.random.PRNGKey(3)
    a = simulate_batch(key, 64, "black_scholes", 0.2, obs_only=True, **BS)
    b = simulate_batch(key, 64, "black_scholes", 0.2, **BS)
    np.testing.assert_array_equal(np.asarray(a.obs_idx), np.asarray(b.obs_idx))
    np.testing.assert_allclose(np.asarray(a.times), np.asarray(b.times))
    assert a.paths is None
    # t=0 observation is deterministic x0
    np.testing.assert_allclose(np.asarray(a.values[:, 0, 0]), BS["x0"])


@pytest.mark.parametrize("process,kw", [("black_scholes", BS),
                                        ("ornstein_uhlenbeck", OU)])
def test_marginal_law_matches_grid_sampling(process, kw):
    """Terminal-value stats: obs_only == grid-subsample == closed form."""
    n = 20000
    a = simulate_batch(jax.random.PRNGKey(0), n, process, 0.1,
                       obs_only=True, **kw)
    b = simulate_batch(jax.random.PRNGKey(1), n, process, 0.1, **kw)
    xa = np.asarray(a.values[:, -1, 0])      # value at T (endpoint forced)
    xb = np.asarray(b.values[:, -1, 0])
    if process == "black_scholes":
        m = kw["x0"] * np.exp(kw["mu"] * kw["T"])
        v = kw["x0"] ** 2 * np.exp(2 * kw["mu"] * kw["T"]) * (
            np.exp(kw["sigma"] ** 2 * kw["T"]) - 1.0)
    else:
        e = np.exp(-kw["theta"] * kw["T"])
        m = kw["x0"] * e + kw["mu"] * (1 - e)
        v = kw["sigma"] ** 2 / (2 * kw["theta"]) * (1 - e ** 2)
    for x in (xa, xb):
        np.testing.assert_allclose(x.mean(), m, rtol=0.05, atol=0.01)
        np.testing.assert_allclose(x.var(), v, rtol=0.10, atol=0.01)
    # and the two samplers agree with each other
    np.testing.assert_allclose(xa.mean(), xb.mean(), rtol=0.05, atol=0.01)
    np.testing.assert_allclose(xa.var(), xb.var(), rtol=0.12, atol=0.01)


def test_intermediate_time_law():
    """Not just the endpoint: stats at an interior observation time agree."""
    n = 20000
    a = simulate_batch(jax.random.PRNGKey(2), n, "black_scholes", 0.2,
                       obs_only=True, **BS)
    t = np.asarray(a.times[:, 1])            # first interior obs per row
    x = np.asarray(a.values[:, 1, 0])
    # E[X_t] = x0 e^{mu t} is t-dependent per row: check the studentized
    # residual of log X against its exact per-row normal law
    mu_log = np.log(BS["x0"]) + (BS["mu"] - 0.5 * BS["sigma"] ** 2) * t
    sd_log = BS["sigma"] * np.sqrt(t)
    z = (np.log(x) - mu_log) / np.maximum(sd_log, 1e-12)
    assert abs(z.mean()) < 0.05
    np.testing.assert_allclose(z.var(), 1.0, rtol=0.05)


@pytest.mark.parametrize("switch", [0.43, None])
def test_hybrid_law_matches_grid_sampling(switch):
    """Hybrid obs_only vs grid-simulate-then-subsample: identical stats at
    every observation slot, for fixed AND random (drawn-first) switch."""
    n = 20000
    kw = dict(HYB, switch_time=switch)
    a = simulate_batch(jax.random.PRNGKey(0), n, "hybrid_ou_bs", 0.1,
                       obs_only=True, **kw)
    b = simulate_batch(jax.random.PRNGKey(1), n, "hybrid_ou_bs", 0.1, **kw)
    assert a.paths is None
    assert a.switch_times is not None and a.switch_times.shape == (n,)
    sw = np.asarray(a.switch_times)
    if switch is None:
        assert sw.min() >= 0.2 and sw.max() <= 0.8
    else:
        np.testing.assert_allclose(sw, switch)

    # compare full per-slot moment profiles between the two samplers
    # (slot j's time distribution is identical by construction — same
    # subsampler law — so slot-wise stats are comparable)
    xa, xb = np.asarray(a.values[..., 0]), np.asarray(b.values[..., 0])
    np.testing.assert_allclose(xa.mean(0), xb.mean(0), rtol=0.03, atol=0.01)
    np.testing.assert_allclose(xa.var(0), xb.var(0), rtol=0.12, atol=0.005)
    # third moment too: the OU->BS composition is NOT Gaussian; matching
    # skewness guards against a wrong regime split
    sa = ((xa - xa.mean(0)) ** 3).mean(0)
    sb = ((xb - xb.mean(0)) ** 3).mean(0)
    np.testing.assert_allclose(sa, sb, rtol=0.35, atol=0.002)


def test_hybrid_obs_only_same_times_and_switch_convention():
    """Same key => same observation times as grid mode; gaps straddling the
    effective switch boundary split exactly like the grid generator."""
    key = jax.random.PRNGKey(9)
    kw = dict(HYB, switch_time=0.5085)  # effective boundary floor(.5085/.02)*.02 = 0.5
    a = simulate_batch(key, 64, "hybrid_ou_bs", 0.2, obs_only=True, **kw)
    b = simulate_batch(key, 64, "hybrid_ou_bs", 0.2, **kw)
    np.testing.assert_array_equal(np.asarray(a.obs_idx), np.asarray(b.obs_idx))
    np.testing.assert_allclose(np.asarray(a.times), np.asarray(b.times))
    np.testing.assert_allclose(np.asarray(a.values[:, 0, 0]), HYB["x0"])


def test_hybrid_obs_only_pure_regime_limits():
    """Degenerate switches reduce to the single-regime exact samplers."""
    from njode_tpu.simulation import hybrid_values_at
    times = jnp.tile(jnp.asarray([[0.0, 0.3, 0.7, 1.0]]), (30000, 1))
    key = jax.random.PRNGKey(4)

    # switch at T: pure OU — matches ou stats
    x_ou, _ = hybrid_values_at(key, times, theta_ou=1.0, mu_ou=0.5,
                               sigma_ou=0.3, mu_bs=0.1, sigma_bs=0.2,
                               x0=0.0, switch_time=1.0, T=1.0, n_steps=50)
    e = np.exp(-0.7)
    m = 0.0 * e + 0.5 * (1 - e)
    v = 0.3 ** 2 / 2 * (1 - e ** 2)
    x = np.asarray(x_ou[:, 2])
    np.testing.assert_allclose(x.mean(), m, atol=0.01)
    np.testing.assert_allclose(x.var(), v, rtol=0.05)

    # switch at 0 (effective boundary 0): pure BS — lognormal law
    x_bs, _ = hybrid_values_at(key, times, theta_ou=1.0, mu_ou=0.5,
                               sigma_ou=0.3, mu_bs=0.1, sigma_bs=0.2,
                               x0=1.0, switch_time=0.0, T=1.0, n_steps=50)
    lx = np.log(np.asarray(x_bs[:, 3]))
    np.testing.assert_allclose(lx.mean(), (0.1 - 0.5 * 0.04) * 1.0, atol=0.01)
    np.testing.assert_allclose(lx.var(), 0.04 * 1.0, rtol=0.05)


def test_unsupported_raises():
    with pytest.raises(ValueError, match="obs_only"):
        simulate_batch(jax.random.PRNGKey(0), 8, "heston", 0.1,
                       obs_only=True, T=1.0, n_steps=20)


def test_registry_override_disables_obs_only():
    """A custom generator registered under a built-in name wins in
    simulate_batch, so obs_only must refuse (its exact law no longer
    describes the data)."""
    from njode_tpu.simulation.registry import _PATHS, register_process

    def fake_bs(key, n_paths, T=1.0, n_steps=20, **kw):
        times = jnp.linspace(0.0, T, n_steps + 1)
        return times, jnp.ones((n_paths, n_steps + 1))

    register_process("black_scholes", fake_bs)
    try:
        assert not supports_obs_only("black_scholes")
        with pytest.raises(ValueError, match="obs_only"):
            simulate_batch(jax.random.PRNGKey(0), 4, "black_scholes", 0.2,
                           obs_only=True, T=1.0, n_steps=20)
    finally:
        del _PATHS["black_scholes"]
    assert supports_obs_only("black_scholes")


def test_trains_end_to_end():
    import optax
    model = NeuralJumpODE(input_dim=1, hidden_dim=8, output_dim=1,
                          num_moments=2)
    params = model.init(jax.random.PRNGKey(0))
    tx = make_adam(1e-2)
    opt = tx.init(params)
    batch = simulate_batch(jax.random.PRNGKey(1), 64, "black_scholes", 0.2,
                           obs_only=True, **BS)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            pr, pb = model.apply(p, batch.times, batch.values, batch.mask)
            return nj_ode_loss(batch.times, batch.values, pr, pb,
                               ignore_first_continuity=True,
                               moment_weights=[1.0, 10.0], mask=batch.mask)
        loss, g = jax.value_and_grad(loss_fn)(params)
        up, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, up), opt, loss

    losses = []
    for _ in range(30):
        params, opt, loss = step(params, opt)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_nd_obs_only_law_and_times():
    """Registry obs_values_fn path: correlated d-dim GBM/OU exact sampling."""
    n, d = 20000, 2
    corr = [[1.0, 0.6], [0.6, 1.0]]
    kw = dict(T=1.0, n_steps=40, dims=d, corr=corr)
    assert supports_obs_only("black_scholes_nd")
    assert supports_obs_only("ornstein_uhlenbeck_nd")

    key = jax.random.PRNGKey(5)
    a = simulate_batch(key, 256, "black_scholes_nd", 0.2, obs_only=True,
                       mu=0.1, sigma=0.5, x0=1.0, **kw)
    b = simulate_batch(key, 256, "black_scholes_nd", 0.2,
                       mu=0.1, sigma=0.5, x0=1.0, **kw)
    np.testing.assert_allclose(np.asarray(a.times), np.asarray(b.times))
    assert a.values.shape == b.values.shape  # (256, N, 2)
    assert a.paths is None

    # marginal law at T + driving correlation of the log-increments
    big = simulate_batch(jax.random.PRNGKey(6), n, "black_scholes_nd", 0.1,
                         obs_only=True, mu=0.1, sigma=0.5, x0=1.0, **kw)
    xT = np.asarray(big.values[:, -1, :])
    m = 1.0 * np.exp(0.1 * 1.0)
    np.testing.assert_allclose(xT.mean(axis=0), [m, m], rtol=0.05)
    logs = np.log(np.asarray(big.values[:, 1:, :])
                  / np.asarray(big.values[:, :-1, :]))
    r = np.corrcoef(logs[..., 0].ravel(), logs[..., 1].ravel())[0, 1]
    np.testing.assert_allclose(r, 0.6, atol=0.03)

    # OU: terminal marginal stats per component
    ou = simulate_batch(jax.random.PRNGKey(7), n, "ornstein_uhlenbeck_nd",
                        0.1, obs_only=True, theta=1.0, mu=0.5, sigma=0.3,
                        x0=0.0, **kw)
    yT = np.asarray(ou.values[:, -1, :])
    e = np.exp(-1.0)
    np.testing.assert_allclose(yT.mean(axis=0), [0.5 * (1 - e)] * 2,
                               atol=0.02)
    np.testing.assert_allclose(yT.var(axis=0),
                               [0.09 / 2 * (1 - e ** 2)] * 2, rtol=0.1)

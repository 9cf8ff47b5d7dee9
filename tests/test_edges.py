"""Edge cases and guard rails."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from njode_tpu import NeuralJumpODE, nj_ode_loss


def test_single_observation():
    """N=1: after-jump prediction only; before-jump is zero."""
    model = NeuralJumpODE(input_dim=1, hidden_dim=8, output_dim=1,
                          num_moments=2)
    params = model.init(jax.random.PRNGKey(0))
    t = jnp.asarray([[0.0]])
    v = jnp.ones((1, 1, 1))
    p, pb = model.apply(params, t, v)
    assert p.shape == (1, 1, 1, 2)
    assert np.all(np.asarray(pb) == 0.0)
    loss = nj_ode_loss(t, v, p, pb, moment_weights=[1.0, 10.0])
    assert np.isfinite(float(loss))


def test_substep_budget_guard():
    """Concrete gaps beyond the static substep budget raise loudly."""
    model = NeuralJumpODE(input_dim=1, hidden_dim=8, output_dim=1,
                          dt_ode_step=0.01, t_max=1.0)
    params = model.init(jax.random.PRNGKey(0))
    t = jnp.asarray([[0.0, 2.5]])  # gap 2.5 > t_max=1.0 budget
    v = jnp.ones((1, 2, 1))
    with pytest.raises(ValueError, match="substep budget"):
        model.apply(params, t, v)
    # a matching t_max fixes it
    model2 = NeuralJumpODE(input_dim=1, hidden_dim=8, output_dim=1,
                           dt_ode_step=0.01, t_max=2.5)
    p, pb = model2.apply(params, t, v)
    assert np.all(np.isfinite(np.asarray(p)))


def test_multidim_input():
    """d_x > 1 flows through model + loss (the reference model is generic
    in input_dim even though its simulators are 1-D)."""
    model = NeuralJumpODE(input_dim=3, hidden_dim=8, output_dim=3,
                          num_moments=2)
    params = model.init(jax.random.PRNGKey(0))
    B, N = 4, 5
    t = jnp.sort(jax.random.uniform(jax.random.PRNGKey(1), (B, N)), axis=1)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, N, 3))
    p, pb = model.apply(params, t, v)
    assert p.shape == (B, N, 3, 2)
    loss = nj_ode_loss(t, v, p, pb, moment_weights=[1.0, 10.0])
    assert np.isfinite(float(loss))


def test_num_moments_three():
    model = NeuralJumpODE(input_dim=1, hidden_dim=8, output_dim=1,
                          num_moments=3)
    params = model.init(jax.random.PRNGKey(0))
    t = jnp.asarray([[0.0, 0.5, 1.0]])
    v = jnp.ones((1, 3, 1))
    p, pb = model.apply(params, t, v)
    assert p.shape == (1, 3, 1, 3)


def test_unsorted_query_times_ok():
    """predict_at does not require sorted queries."""
    model = NeuralJumpODE(input_dim=1, hidden_dim=8, output_dim=1)
    params = model.init(jax.random.PRNGKey(0))
    t = jnp.asarray([[0.0, 0.5, 1.0]])
    v = jnp.ones((1, 3, 1))
    q_sorted = jnp.asarray([[0.25, 0.75]])
    q_rev = jnp.asarray([[0.75, 0.25]])
    a = model.predict_at(params, t, v, q_sorted)
    b = model.predict_at(params, t, v, q_rev)
    np.testing.assert_allclose(np.asarray(a["raw"][0, 0]),
                               np.asarray(b["raw"][0, 1]), rtol=1e-6)

"""Behavioral model tests.

Ports the reference's six test assertions (reference tests/test_basic.py,
with its two stale-API bugs fixed — SURVEY.md §4) plus masked-scan
specific checks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from njode_tpu import NeuralJumpODE, nj_ode_loss
from njode_tpu.models import pad_ragged
from njode_tpu.simulation import create_trajectory_batch, simulate_batch
from njode_tpu.utils import make_adam

import optax


def small_model(**kw):
    defaults = dict(input_dim=1, hidden_dim=8, output_dim=1, num_moments=2)
    defaults.update(kw)
    return NeuralJumpODE(**defaults)


def test_model_creation():
    """Reference test_basic.py:17-37 (minus the stale n_steps_between kwarg)."""
    model = small_model(n_hidden_layers=2)
    params = model.init(jax.random.PRNGKey(0))
    assert set(params) == {"jump", "ode", "out"}
    n = model.n_params(params)
    assert n > 0
    # separate-network mode: per-moment parameter stacks have leading K axis
    assert params["jump"]["layers"][0]["w"].shape[0] == 2


def test_forward_pass_shapes():
    """Reference test_basic.py:40-67 with the corrected output shape
    (n_obs, d_y, num_moments)."""
    model = small_model()
    params = model.init(jax.random.PRNGKey(0))
    batch_times = [np.array([0.0, 0.3, 1.0], np.float32),
                   np.array([0.0, 0.2, 0.5, 1.0], np.float32)]
    batch_values = [np.ones((3, 1), np.float32),
                    np.ones((4, 1), np.float32)]
    preds, preds_before = model.forward(params, batch_times, batch_values)
    assert len(preds) == 2
    assert preds[0].shape == (3, 1, 2)
    assert preds[1].shape == (4, 1, 2)
    # before-jump prediction at the first observation is identically zero
    assert np.allclose(np.asarray(preds_before[0][0]), 0.0)
    assert np.allclose(np.asarray(preds_before[1][0]), 0.0)


def test_loss_computation():
    """Reference test_basic.py:70-98: finite positive loss on a BS batch."""
    model = small_model()
    params = model.init(jax.random.PRNGKey(0))
    batch = simulate_batch(jax.random.PRNGKey(1), 4, "black_scholes",
                           obs_fraction=0.1)
    preds, preds_before = model.apply(params, batch.times, batch.values,
                                      batch.mask)
    loss = nj_ode_loss(batch.times, batch.values, preds, preds_before,
                       mask=batch.mask, moment_weights=[1.0, 10.0])
    assert np.isfinite(float(loss))
    assert float(loss) > 0


def test_gradient_flow():
    """Reference test_basic.py:101-141: one Adam step, finite grads."""
    model = small_model()
    params = model.init(jax.random.PRNGKey(0))
    tx = make_adam(1e-3, 5e-4)
    opt_state = tx.init(params)
    batch = simulate_batch(jax.random.PRNGKey(1), 4, "black_scholes",
                           obs_fraction=0.1)

    def loss_fn(p):
        preds, preds_before = model.apply(p, batch.times, batch.values,
                                          batch.mask)
        return nj_ode_loss(batch.times, batch.values, preds, preds_before,
                           mask=batch.mask)

    loss, g = jax.value_and_grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in leaves)
    assert any(np.any(np.asarray(x) != 0) for x in leaves)
    updates, opt_state = tx.update(g, opt_state, params)
    new_params = optax.apply_updates(params, updates)
    loss2 = loss_fn(new_params)
    assert np.isfinite(float(loss2))


def test_padding_invariance():
    """Masked scan: padded slots must not change real-slot outputs."""
    model = small_model()
    params = model.init(jax.random.PRNGKey(0))
    t = np.array([[0.0, 0.4, 1.0]], np.float32)
    v = np.ones((1, 3, 1), np.float32)
    p1, pb1 = model.apply(params, jnp.asarray(t), jnp.asarray(v))
    # same trajectory padded with 2 junk slots at the end
    t_pad = np.array([[0.0, 0.4, 1.0, 1.0, 1.0]], np.float32)
    v_pad = np.concatenate([v, np.full((1, 2, 1), 7.0, np.float32)], axis=1)
    m_pad = np.array([[True, True, True, False, False]])
    p2, pb2 = model.apply(params, jnp.asarray(t_pad), jnp.asarray(v_pad),
                          jnp.asarray(m_pad))
    np.testing.assert_allclose(np.asarray(p1[0]), np.asarray(p2[0, :3]),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(pb1[0]), np.asarray(pb2[0, :3]),
                               rtol=1e-6)


def test_loss_hand_computed():
    """Mean-only loss against a hand-computed value."""
    # one trajectory, two obs, d_x=1, K=1
    values = jnp.asarray([[[1.0], [2.0]]])            # (1, 2, 1)
    preds = jnp.asarray([[[[1.5]], [[2.5]]]])         # (1, 2, 1, 1)
    preds_before = jnp.asarray([[[[0.0]], [[1.0]]]])
    eps = 1e-10
    # obs0: jump=(1-1.5)^2=0.25, cont=(1-0)^2=1 -> (.5+1)^2=2.25
    # obs1: jump=(2-2.5)^2=0.25, cont=(2-1)^2=1 -> 2.25 ; mean=2.25
    loss = nj_ode_loss(None, values, preds, preds_before, eps=eps)
    assert abs(float(loss) - 2.25) < 1e-5
    # ignore_first_continuity: obs0 cont -> 0: (sqrt(.25)+sqrt(0))^2=0.25
    loss2 = nj_ode_loss(None, values, preds, preds_before, eps=eps,
                        ignore_first_continuity=True)
    assert abs(float(loss2) - (0.25 + 2.25) / 2) < 1e-4


def test_moment_weights_and_extra_moments():
    """Moments >= 2 contribute nothing; weights scale moments 0/1."""
    model = small_model(num_moments=3)
    params = model.init(jax.random.PRNGKey(0))
    batch = simulate_batch(jax.random.PRNGKey(1), 2, "black_scholes",
                           obs_fraction=0.1)
    preds, preds_before = model.apply(params, batch.times, batch.values)
    l1 = nj_ode_loss(batch.times, batch.values, preds, preds_before,
                     moment_weights=[1.0, 2.0, 999.0], mask=batch.mask)
    l2 = nj_ode_loss(batch.times, batch.values, preds, preds_before,
                     moment_weights=[1.0, 2.0, 0.0], mask=batch.mask)
    assert abs(float(l1) - float(l2)) < 1e-6  # 3rd weight never used


def test_dropout_determinism():
    model = small_model(dropout_rate=0.5)
    params = model.init(jax.random.PRNGKey(0))
    batch = simulate_batch(jax.random.PRNGKey(1), 2, "black_scholes",
                           obs_fraction=0.1)
    r = jax.random.PRNGKey(42)
    p1, _ = model.apply(params, batch.times, batch.values, batch.mask,
                        rng=r, training=True)
    p2, _ = model.apply(params, batch.times, batch.values, batch.mask,
                        rng=r, training=True)
    p3, _ = model.apply(params, batch.times, batch.values, batch.mask,
                        rng=jax.random.PRNGKey(43), training=True)
    p4, _ = model.apply(params, batch.times, batch.values, batch.mask)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2))
    assert not np.allclose(np.asarray(p1), np.asarray(p3))
    assert not np.allclose(np.asarray(p1), np.asarray(p4))


def test_predict_on_grid_jump_consistency():
    """At observation grid points the rollout emits the after-jump readout,
    which must agree with apply()'s after-jump prediction there."""
    model = small_model()
    params = model.init(jax.random.PRNGKey(0))
    batch = simulate_batch(jax.random.PRNGKey(1), 2, "black_scholes",
                           obs_fraction=0.1, n_steps=50)
    G = batch.grid_times.shape[0]
    obs_mask = jnp.zeros((2, G), bool).at[
        jnp.arange(2)[:, None], batch.obs_idx].set(True)
    out = model.predict_on_grid(params, batch.grid_times, obs_mask,
                                batch.paths[..., None])
    preds, _ = model.apply(params, batch.times, batch.values, batch.mask)
    for b in range(2):
        got = np.asarray(out["raw"][b])[np.asarray(batch.obs_idx[b])]
        np.testing.assert_allclose(got, np.asarray(preds[b]), rtol=1e-5,
                                   atol=1e-6)


def test_ragged_loss_differentiable():
    """jax.grad must flow through the reference-style pipeline
    model.forward -> ragged nj_ode_loss (VERDICT r3 weak #1): the wrapper
    densifies with jnp ops, so tracer predictions are legal inputs."""
    model = small_model()
    params = model.init(jax.random.PRNGKey(0))
    batch_times = [np.array([0.0, 0.3, 1.0], np.float32),
                   np.array([0.0, 0.2, 0.5, 1.0], np.float32)]
    batch_values = [np.cumsum(np.ones((3, 1), np.float32), 0),
                    np.cumsum(np.ones((4, 1), np.float32), 0)]

    def loss_fn(p):
        preds, preds_before = model.forward(p, batch_times, batch_values)
        return nj_ode_loss(batch_times, batch_values, preds, preds_before,
                           moment_weights=[1.0, 10.0])

    loss, g = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in leaves)
    assert any(np.any(np.asarray(x) != 0) for x in leaves)

    # and the ragged path must agree with the dense path on the same data
    times, values, mask = pad_ragged(batch_times, batch_values)
    preds_d, preds_before_d = model.apply(params, times, values, mask)
    dense = nj_ode_loss(times, values, preds_d, preds_before_d, mask=mask,
                        moment_weights=[1.0, 10.0])
    assert abs(float(loss) - float(dense)) < 1e-6


def test_predict_on_grid_rejects_nonuniform_grid():
    """The derived static substep count assumes uniform spacing; a
    non-uniform dense grid must raise, not silently mis-substep
    (VERDICT r3 weak #5)."""
    model = small_model(dt_ode_step=0.01)
    params = model.init(jax.random.PRNGKey(0))
    grid = jnp.asarray([0.0, 0.1, 0.2, 0.5, 1.0], jnp.float32)
    obs_mask = jnp.array([[True, False, False, False, True]])
    vals = jnp.ones((1, 5, 1), jnp.float32)
    with pytest.raises(ValueError, match="uniform"):
        model.predict_on_grid(params, grid, obs_mask, vals)
    # explicit n_sub opts out of the derivation and works
    out = model.predict_on_grid(params, grid, obs_mask, vals, n_sub=4)
    assert np.all(np.isfinite(np.asarray(out["raw"])))

"""Whole-run training kernel (ops/train_kernel.py) vs the XLA trainer.

Runs in Pallas interpreter mode on CPU.  Pins the full composed semantics:
per-minibatch losses AND the final parameters after G fused
forward+loss-gradient+backward+Adam steps must match an optax reference
loop (model.apply + nj_ode_loss_dense + make_adam) step-for-step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from njode_tpu import NeuralJumpODE
from njode_tpu.models.loss import nj_ode_loss_dense
from njode_tpu.ops.train_kernel import (fused_train_run, init_train_state,
                                        pack_minibatches,
                                        train_kernel_available,
                                        train_state_params)
from njode_tpu.simulation import simulate_batch
from njode_tpu.utils.training import make_adam

H, N, BS = 12, 5, 16


def _data(n_traj, seed=0):
    batch = simulate_batch(jax.random.PRNGKey(seed), n_traj, "black_scholes",
                           obs_fraction=N / 100.0, obs_only=True,
                           mu=0.1, sigma=0.5, x0=1.0)
    assert batch.times.shape[1] == N
    return batch.times, batch.values


def _reference_loop(params, times, values, valid, G, lr, wd,
                    variance_method="direct"):
    """The XLA trainer the kernel must reproduce: minibatch Adam steps."""
    model = NeuralJumpODE(input_dim=1, hidden_dim=H, output_dim=1,
                          num_moments=2, variance_method=variance_method)
    tx = make_adam(lr, wd)
    opt = tx.init(params)
    losses = []
    for g in range(G):
        sl = slice(g * BS, (g + 1) * BS)
        t, v, tm = times[sl], values[sl], valid[sl]

        def loss_fn(p):
            pr, pb = model.apply(p, t, v)
            return nj_ode_loss_dense(v, pr, pb, None,
                                     ignore_first_continuity=True,
                                     moment_weights=[1.0, 10.0],
                                     variance_method=variance_method,
                                     traj_mask=tm)

        l, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt = tx.update(grads, opt, params)
        params = optax.apply_updates(params, upd)
        losses.append(float(l))
    return params, losses


def _run_kernel(params, times, values, valid, G, lr, wd,
                variance_method="direct", split=None):
    data = pack_minibatches(times, values, valid, BS)
    st = init_train_state(params, num_moments=2, hidden_dim=H)
    kw = dict(n_slots=N, num_moments=2, batch_size=BS, lr=lr,
              weight_decay=wd, variance_method=variance_method,
              interpret=True)
    if split is None:
        st, losses = fused_train_run(st, data, **kw)
    else:
        st, l1 = fused_train_run(st, data[:split * BS], **kw)
        st, l2 = fused_train_run(st, data[split * BS:], **kw)
        losses = jnp.concatenate([l1, l2])
    return train_state_params(st, num_moments=2, hidden_dim=H), losses


@pytest.mark.parametrize("variance_method", ["direct", "second_moment"])
def test_matches_optax_loop(variance_method):
    G = 4
    times, values = _data(G * BS)
    valid = jnp.ones((G * BS,), bool)
    model = NeuralJumpODE(input_dim=1, hidden_dim=H, output_dim=1,
                          num_moments=2)
    params = model.init(jax.random.PRNGKey(0))

    p_ref, l_ref = _reference_loop(params, times, values, valid, G,
                                   1e-3, 5e-4, variance_method)
    p_k, l_k = _run_kernel(params, times, values, valid, G,
                           1e-3, 5e-4, variance_method)

    np.testing.assert_allclose(np.asarray(l_k), np.asarray(l_ref),
                               rtol=2e-5)
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_leaves_with_path(p_ref),
            jax.tree_util.tree_leaves_with_path(p_k)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-4, atol=2e-6,
            err_msg=f"param drift at {jax.tree_util.keystr(ka)}")


def test_traj_mask_padding_rows():
    """Invalid rows (padded final minibatch) are weighted out exactly like
    nj_ode_loss_dense's traj_mask."""
    G = 3
    times, values = _data(G * BS, seed=3)
    valid = jnp.ones((G * BS,), bool).at[-5:].set(False)

    p0 = NeuralJumpODE(input_dim=1, hidden_dim=H, output_dim=1,
                       num_moments=2).init(jax.random.PRNGKey(1))
    p_ref, l_ref = _reference_loop(p0, times, values, valid, G, 1e-3, 0.0)
    p_k, l_k = _run_kernel(p0, times, values, valid, G, 1e-3, 0.0)
    np.testing.assert_allclose(np.asarray(l_k), np.asarray(l_ref), rtol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p_ref),
                    jax.tree_util.tree_leaves(p_k)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=2e-6)


def test_resume_across_calls():
    """Two chained kernel calls == one call (state incl. the Adam
    bias-correction powers round-trips)."""
    G = 4
    times, values = _data(G * BS, seed=5)
    valid = jnp.ones((G * BS,), bool)
    p0 = NeuralJumpODE(input_dim=1, hidden_dim=H, output_dim=1,
                       num_moments=2).init(jax.random.PRNGKey(2))

    p_one, l_one = _run_kernel(p0, times, values, valid, G, 1e-3, 5e-4)
    p_two, l_two = _run_kernel(p0, times, values, valid, G, 1e-3, 5e-4,
                               split=2)
    np.testing.assert_allclose(np.asarray(l_two), np.asarray(l_one),
                               rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p_one),
                    jax.tree_util.tree_leaves(p_two)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-6, atol=1e-8)


def test_availability_gating():
    assert train_kernel_available(False, 1, 1, 1, "relu", 0.0, "identity",
                                  None)
    assert not train_kernel_available(True, 1, 1, 1, "relu", 0.0,
                                      "identity", None)   # shared
    assert not train_kernel_available(False, 1, 1, 1, "sigmoid", 0.0,
                                      "identity", None)   # f(0) != 0
    assert not train_kernel_available(False, 1, 1, 1, "relu", 0.0,
                                      "identity", 0.01)   # substep loop
    assert not train_kernel_available(False, 1, 1, 1, "relu", 0.3,
                                      "identity", None)   # dropout

"""Pallas fused-cell kernel tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from njode_tpu import NeuralJumpODE
from njode_tpu.ops import HAS_PALLAS, fused_cell_available
from njode_tpu.simulation import simulate_batch

pytestmark = pytest.mark.skipif(not HAS_PALLAS, reason="pallas unavailable")


def _models(activation="relu", dt_ode_step=None):
    kw = dict(input_dim=1, hidden_dim=32, output_dim=1, num_moments=2,
              activation=activation, dt_ode_step=dt_ode_step, t_max=1.0)
    ref = NeuralJumpODE(use_pallas=False, **kw)
    fused = NeuralJumpODE(use_pallas="interpret", **kw)
    return ref, fused


def test_eligibility_gate():
    assert fused_cell_available(1, "relu", 0.0)
    assert not fused_cell_available(2, "relu", 0.0)    # deeper ODEFunc
    assert fused_cell_available(1, "selu", 0.0)    # analytic grads cover
    assert not fused_cell_available(1, "gelu", 0.0)    # unknown activation
    assert not fused_cell_available(1, "relu", 0.1)    # dropout


@pytest.mark.parametrize("activation", ["relu", "tanh"])
@pytest.mark.parametrize("dt_ode_step", [None, 0.05])
def test_fused_matches_xla_forward(activation, dt_ode_step):
    ref, fused = _models(activation, dt_ode_step)
    params = ref.init(jax.random.PRNGKey(0))
    batch = simulate_batch(jax.random.PRNGKey(1), 4, "black_scholes", 0.1,
                           n_steps=20)
    p1, pb1 = ref.apply(params, batch.times, batch.values, batch.mask)
    p2, pb2 = fused.apply(params, batch.times, batch.values, batch.mask)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(pb1), np.asarray(pb2), rtol=1e-5,
                               atol=1e-6)


def test_fused_matches_xla_gradient():
    from njode_tpu.models import nj_ode_loss_dense
    ref, fused = _models("tanh")
    params = ref.init(jax.random.PRNGKey(0))
    batch = simulate_batch(jax.random.PRNGKey(1), 4, "black_scholes", 0.1,
                           n_steps=20)

    def make_loss(model):
        def loss_fn(p):
            preds, preds_before = model.apply(p, batch.times, batch.values,
                                              batch.mask)
            return nj_ode_loss_dense(batch.values, preds, preds_before,
                                     batch.mask, moment_weights=[1.0, 10.0])
        return loss_fn

    g1 = jax.grad(make_loss(ref))(params)
    g2 = jax.grad(make_loss(fused))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-6)

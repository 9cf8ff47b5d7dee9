"""Higher-order latent-ODE solvers (heun/rk4) — extension beyond the
reference, which integrates with explicit Euler only (models/jump_ode.py:
122-140).  Default 'euler' keeps exact reference semantics (pinned by the
torch parity suite); these tests verify the solvers' convergence orders on
the model's own smooth dynamics and end-to-end training.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from njode_tpu import NeuralJumpODE
from njode_tpu.simulation import simulate_batch


def _integrate_error(solver: str, n_sub: int, ref_h):
    """Latent state after integrating [0, 0.48] with n_sub equal substeps.

    Runs in float64 (callers wrap in ``jax.enable_x64``) so the
    rk4 error stays above the arithmetic floor down to tiny dt.
    """
    model = NeuralJumpODE(input_dim=1, hidden_dim=16, output_dim=1,
                          activation="tanh", input_scaling="tanh",
                          dt_ode_step=0.48 / n_sub, max_substeps=n_sub + 1,
                          ode_solver=solver, dtype=jnp.float64)
    params = model.init(jax.random.PRNGKey(0))
    B = 4
    h0 = jax.random.normal(jax.random.PRNGKey(1), (1, B, 16),
                           jnp.float64) * 0.5
    x = jax.random.normal(jax.random.PRNGKey(2), (B, 1), jnp.float64)
    t0 = jnp.zeros((B,), jnp.float64)
    t1 = jnp.full((B,), 0.48, jnp.float64)
    out = model._integrate_gap(params, h0, x, t0, t1)
    if ref_h is None:
        return out, None
    return out, float(jnp.max(jnp.abs(out - ref_h)))


@pytest.fixture(scope="module")
def fine_reference():
    """Near-exact solution: rk4 with 512 substeps (float64)."""
    with jax.enable_x64(True):
        ref, _ = _integrate_error("rk4", 512, None)
        return np.asarray(ref)


@pytest.mark.parametrize("solver,subs,min_order", [
    ("euler", (8, 16, 32), 0.9),
    ("heun", (8, 16, 32), 1.8),
    ("rk4", (4, 8, 16), 3.5),
])
def test_convergence_order(solver, subs, min_order, fine_reference):
    """Halving dt must shrink the error by ~2^order."""
    with jax.enable_x64(True):
        errs = [_integrate_error(solver, n, jnp.asarray(fine_reference))[1]
                for n in subs]
    orders = [np.log2(errs[i] / errs[i + 1]) for i in range(len(errs) - 1)]
    assert min(orders) > min_order, (solver, errs, orders)


def test_higher_order_more_accurate_at_same_dt(fine_reference):
    with jax.enable_x64(True):
        ref = jnp.asarray(fine_reference)
        _, e_euler = _integrate_error("euler", 16, ref)
        _, e_heun = _integrate_error("heun", 16, ref)
        _, e_rk4 = _integrate_error("rk4", 16, ref)
    assert e_rk4 < e_heun < e_euler


def test_solver_validation():
    with pytest.raises(ValueError):
        NeuralJumpODE(input_dim=1, hidden_dim=8, output_dim=1,
                      ode_solver="dopri5")


def test_solvers_disable_kernels():
    m = NeuralJumpODE(input_dim=1, hidden_dim=8, output_dim=1,
                      dt_ode_step=0.05, ode_solver="heun",
                      use_pallas=True)
    assert not m._use_gap_scan(8)
    assert not m._use_fused()


@pytest.mark.parametrize("solver", ["heun", "rk4"])
def test_training_with_higher_order_solver(solver):
    """Forward/backward/training all work with the higher-order steps."""
    import optax
    from njode_tpu.models import nj_ode_loss_dense

    model = NeuralJumpODE(input_dim=1, hidden_dim=16, output_dim=1,
                          num_moments=2, activation="tanh",
                          dt_ode_step=0.05, ode_solver=solver)
    params = model.init(jax.random.PRNGKey(0))
    batch = simulate_batch(jax.random.PRNGKey(1), 32, "black_scholes", 0.1,
                           n_steps=50)
    opt = optax.adam(1e-2)
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        def f(p):
            preds, before = model.apply(p, batch.times, batch.values,
                                        batch.mask)
            return nj_ode_loss_dense(batch.values, preds, before, batch.mask,
                                     moment_weights=(1.0, 10.0))
        l, g = jax.value_and_grad(f)(p)
        u, s = opt.update(g, s, p)
        return optax.apply_updates(p, u), s, l

    l0 = None
    for _ in range(30):
        params, state, l = step(params, state)
        l0 = float(l) if l0 is None else l0
    assert np.isfinite(float(l)) and float(l) < l0


def test_dropout_rng_paths_run():
    """Stage-wise dropout rngs don't crash heun/rk4 in training mode."""
    model = NeuralJumpODE(input_dim=1, hidden_dim=8, output_dim=1,
                          dropout_rate=0.2, dt_ode_step=0.1,
                          ode_solver="rk4")
    params = model.init(jax.random.PRNGKey(0))
    batch = simulate_batch(jax.random.PRNGKey(1), 4, "black_scholes", 0.1,
                           n_steps=20)
    p, pb = model.apply(params, batch.times, batch.values, batch.mask,
                        rng=jax.random.PRNGKey(2), training=True)
    assert np.isfinite(np.asarray(p)).all()

"""Time-major grid-walk gap integration (``grid_walk=True``).

When every observation time sits on the integration grid
``{g * dt_ode_step}`` — always true for simulated data whose grid spacing
is a multiple of ``dt_ode_step`` — ``apply`` can integrate ALL gaps with
one walk over that grid instead of per-gap predicated substep loops,
doing ~n_slots x fewer ODEFunc evaluations (jump_ode.py
``_integrate_gaps_grid``).  In exact arithmetic the two forms coincide
(a grid gap of k*dt is exactly k uniform solver steps; the reference's
final 'partial' step, models/jump_ode.py:196-202, has t_elapsed = dt
there); in floats the time features differ by ~1 ulp of accumulation, so
parity is pinned tightly in f64 and at roundoff tolerance in f32.
"""

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest

from njode_tpu import NeuralJumpODE
from njode_tpu.models import nj_ode_loss_dense
from njode_tpu.models.jump_ode import pad_ragged
from njode_tpu.simulation import simulate_batch


def _aligned_batch(n=12, n_steps=20, key=0):
    """Simulated BS batch whose times are multiples of T/n_steps."""
    return simulate_batch(jax.random.PRNGKey(key), n, "black_scholes", 0.25,
                          T=1.0, n_steps=n_steps, mu=0.1, sigma=0.4, x0=1.0)


def _pair(dt_ode_step, *, dtype=jnp.float32, solver="euler", **kw):
    """Same-weights (per-gap, grid-walk) model pair."""
    common = dict(input_dim=1, hidden_dim=20, output_dim=1, num_moments=2,
                  dt_ode_step=dt_ode_step, t_max=1.0, ode_solver=solver,
                  dtype=dtype, **kw)
    m_gap = NeuralJumpODE(**common)
    m_walk = NeuralJumpODE(grid_walk=True, **common)
    params = m_gap.init(jax.random.PRNGKey(3))
    return m_gap, m_walk, params


def test_walk_matches_pergap_f64():
    """Exact-arithmetic equivalence: on a dyadic grid (dt = 1/16, every
    time and accumulation step exactly representable) the two forms agree
    to machine precision — the walk IS the per-gap semantics, not an
    approximation of it.  (On non-dyadic grids like the production
    dt=0.01 they differ by ~1 ulp of time-feature rounding only.)"""
    with jax.enable_x64(True):
        b = _aligned_batch(n_steps=16)
        times = b.times.astype(jnp.float64)
        values = b.values.astype(jnp.float64)
        m_gap, m_walk, params = _pair(0.0625, dtype=jnp.float64)
        pa, pb = m_gap.apply(params, times, values, b.mask)
        wa, wb = m_walk.apply(params, times, values, b.mask)
    np.testing.assert_array_equal(np.asarray(pa), np.asarray(wa))
    np.testing.assert_allclose(np.asarray(pb), np.asarray(wb),
                               rtol=1e-14, atol=1e-15)


@pytest.mark.parametrize("solver", ["euler", "heun", "rk4"])
def test_walk_matches_pergap_solvers(solver):
    """All three fixed-step solvers ride the same walk."""
    with jax.enable_x64(True):
        b = _aligned_batch(n_steps=8)
        times = b.times.astype(jnp.float64)
        values = b.values.astype(jnp.float64)
        m_gap, m_walk, params = _pair(0.125, dtype=jnp.float64, solver=solver,
                                      activation="tanh", input_scaling="tanh")
        _, pb = m_gap.apply(params, times, values, b.mask)
        _, wb = m_walk.apply(params, times, values, b.mask)
    np.testing.assert_allclose(np.asarray(pb), np.asarray(wb),
                               rtol=1e-9, atol=1e-11)


def test_walk_f32_loss_and_grad_parity():
    """f32: loss and gradients match the per-gap path to roundoff
    (the walk is a drop-in replacement inside the training step)."""
    b = _aligned_batch(n=16, n_steps=50)
    m_gap, m_walk, params = _pair(0.02)

    def loss_fn(model):
        def f(p):
            preds, before = model.apply(p, b.times, b.values, b.mask)
            return nj_ode_loss_dense(b.values, preds, before, b.mask,
                                     ignore_first_continuity=True,
                                     moment_weights=[1.0, 10.0])
        return f

    lg, gg = jax.value_and_grad(loss_fn(m_gap))(params)
    lw, gw = jax.value_and_grad(loss_fn(m_walk))(params)
    np.testing.assert_allclose(float(lg), float(lw), rtol=2e-5)
    flat_g = jax.flatten_util.ravel_pytree(gg)[0]
    flat_w = jax.flatten_util.ravel_pytree(gw)[0]
    scale = float(jnp.max(jnp.abs(flat_g)))
    np.testing.assert_allclose(np.asarray(flat_w), np.asarray(flat_g),
                               rtol=2e-3, atol=2e-4 * scale)


def test_walk_ragged_mask_parity():
    """End-padded ragged batches: padded slots scatter into the dump cell
    and the walk's valid-slot outputs match the per-gap path."""
    with jax.enable_x64(True):
        rng = np.random.default_rng(7)
        bt, bv = [], []
        for n_obs in (3, 5, 9, 2):
            idx = np.sort(rng.choice(np.arange(1, 16), n_obs - 2,
                                     replace=False))
            idx = np.concatenate([[0], idx, [16]])
            bt.append(jnp.asarray(idx, jnp.float64) * 0.0625)
            bv.append(jnp.asarray(rng.normal(size=(n_obs, 1)) * 0.3 + 1.0,
                                  jnp.float64))
        times, values, mask = pad_ragged(bt, bv, jnp.float64)
        m_gap, m_walk, params = _pair(0.0625, dtype=jnp.float64)
        _, pb = m_gap.apply(params, times, values, mask)
        _, wb = m_walk.apply(params, times, values, mask)
        valid = np.asarray(mask)[:, :, None, None]
    np.testing.assert_allclose(np.asarray(wb) * valid, np.asarray(pb) * valid,
                               rtol=1e-13, atol=1e-14)


def test_walk_guards():
    with pytest.raises(ValueError, match="grid_walk"):
        NeuralJumpODE(input_dim=1, hidden_dim=8, output_dim=1,
                      grid_walk=True)  # no dt_ode_step

    m = NeuralJumpODE(input_dim=1, hidden_dim=8, output_dim=1, num_moments=2,
                      dt_ode_step=0.1, t_max=1.0, grid_walk=True)
    params = m.init(jax.random.PRNGKey(0))
    # off-grid observation time
    times = jnp.asarray([[0.0, 0.23, 1.0]])
    values = jnp.ones((1, 3, 1))
    with pytest.raises(ValueError, match="not multiples"):
        m.apply(params, times, values)
    # duplicate observation time (zero-length gap shares a grid cell)
    times = jnp.asarray([[0.0, 0.5, 0.5]])
    with pytest.raises(ValueError, match="strictly increasing"):
        m.apply(params, times, values)
    # beyond the integration grid
    times = jnp.asarray([[0.0, 0.5, 1.4]])
    with pytest.raises(ValueError, match="exceeds the integration grid"):
        m.apply(params, times, values)


def test_walk_debug_checks_traced():
    """Under jit the concrete-input guard can't see the data; the
    debug_checks in-graph assert catches off-grid times instead."""
    m = NeuralJumpODE(input_dim=1, hidden_dim=8, output_dim=1, num_moments=2,
                      dt_ode_step=0.1, t_max=1.0, grid_walk=True,
                      debug_checks=True)
    params = m.init(jax.random.PRNGKey(0))
    good = jnp.asarray([[0.0, 0.5, 1.0]])
    bad = jnp.asarray([[0.0, 0.23, 1.0]])
    values = jnp.ones((1, 3, 1))
    f = jax.jit(lambda t: m.apply(params, t, values))
    jax.block_until_ready(f(good))  # aligned: passes
    with pytest.raises(Exception, match="off the integration grid"):
        jax.block_until_ready(f(bad))


def test_resolve_grid_walk_policy():
    """'auto' engages exactly in the fused walk kernel's measured-win
    regime: TPU platform, kernels on auto, kernel-eligible config, and a
    provably aligned grid (BENCH_NOTES.md r3g/r3h)."""
    from njode_tpu.utils.training import (_grid_walk_aligned,
                                          _resolve_grid_walk)

    def cfg(dt, T=1.0, n=100, s="auto", **kw):
        return {"grid_walk": s, "dt_ode_step": dt, "hidden_dim": 50,
                "data": {"T": T, "n_steps": n}, **kw}

    def auto(c, platform="tpu", single=True, kernels="auto"):
        return _resolve_grid_walk(c, platform, single, kernels)

    # the production config's shape engages under auto on TPU
    assert auto(cfg(0.01))
    assert not auto(cfg(0.01), platform="cpu")       # kernel is TPU-only
    assert not auto(cfg(0.01), single=False)         # meshes keep per-gap
    assert not auto(cfg(0.01), kernels=False)        # --kernels off
    assert not auto(cfg(0.02))                       # misaligned grid
    assert not auto(cfg(0.01, n_hidden_layers=2))    # kernel-ineligible
    assert not auto(cfg(0.01, dropout_rate=0.1))
    # non-euler solvers: only the whole-run walk-TRAIN kernel can carry
    # the walk (r5), so 'auto' engages exactly for its static config gate
    # (shared network etc.) — and still only on an aligned grid, which
    # bounds dt to the data spacing (dt=0.05 over an 0.01 grid stays on
    # the composed per-gap path)
    assert not auto(cfg(0.01, ode_solver="rk4"))        # separate networks
    assert auto(cfg(0.01, ode_solver="rk4", shared_network=True))
    assert auto(cfg(0.01, ode_solver="heun", shared_network=True))
    assert not auto(cfg(0.05, ode_solver="rk4", shared_network=True))
    assert not auto(cfg(0.01, ode_solver="rk4", shared_network=True),
                    platform="cpu")
    assert not auto(cfg(0.01, ensemble=4))
    assert not auto(cfg(None))                       # nothing to walk
    assert not _resolve_grid_walk(cfg(0.01, s="off"), "tpu", True, "auto")
    assert _resolve_grid_walk(cfg(0.02, s="on"))     # explicit promise

    # alignment: spacing T/n_steps must be an integer multiple of dt
    assert _grid_walk_aligned(cfg(0.01))          # spacing == dt
    assert _grid_walk_aligned(cfg(0.005))         # spacing = 2 * dt
    assert not _grid_walk_aligned(cfg(0.02))      # obs can sit off-grid
    assert not _grid_walk_aligned(cfg(0.003))     # non-integer ratio
    assert not _grid_walk_aligned(cfg(None))

    # 'on' with a misaligned config is rejected statically (inside jit the
    # model's concrete-input check can't see the traced data)
    from njode_tpu.utils.training import _use_grid_walk
    assert _use_grid_walk(cfg(0.005, s="on"))
    with pytest.raises(ValueError, match="not an integer multiple"):
        _use_grid_walk(cfg(0.02, s="on"))


def test_run_experiment_grid_walk_parity(tmp_path):
    """End-to-end: the auto-engaged walk trains to the same losses as the
    per-gap path on the same seeded data streams (f32 roundoff apart)."""
    from njode_tpu.utils.training import run_experiment

    def run(name, setting):
        config = {
            "experiment_name": name, "input_dim": 1, "hidden_dim": 16,
            "output_dim": 1, "num_moments": 2, "n_hidden_layers": 1,
            "activation": "relu", "dt_ode_step": 0.05, "ode_solver": "euler",
            "learning_rate": 1e-3, "weight_decay": 0.0, "n_epochs": 4,
            "batch_size": 32, "print_every": 4, "seed": 0, "data_seed": 0,
            "grid_walk": setting,
            "data": {"process_type": "black_scholes", "n_train": 64,
                     "n_val": 32, "obs_fraction": 0.15, "T": 1.0,
                     "n_steps": 20, "mu": 0.1, "sigma": 0.4, "x0": 1.0},
        }
        return run_experiment(config, save_dir=str(tmp_path))

    r_walk = run("gw_on", "on")
    r_gap = run("gw_off", "off")
    np.testing.assert_allclose(r_walk["history"]["train_loss"],
                               r_gap["history"]["train_loss"], rtol=5e-3)
    np.testing.assert_allclose(r_walk["final_val_loss"],
                               r_gap["final_val_loss"], rtol=5e-3)


def test_walk_dropout_training_smoke():
    """Dropout rng rides the walk (per-grid-cell folds); a short Adam run
    must still reduce the loss."""
    import optax
    b = _aligned_batch(n=32, n_steps=20, key=5)
    m = NeuralJumpODE(input_dim=1, hidden_dim=24, output_dim=1, num_moments=2,
                      dt_ode_step=0.05, t_max=1.0, grid_walk=True,
                      dropout_rate=0.1)
    params = m.init(jax.random.PRNGKey(0))
    tx = optax.adam(1e-2)
    opt = tx.init(params)

    @jax.jit
    def step(p, o, key):
        def f(pp):
            preds, before = m.apply(pp, b.times, b.values, b.mask,
                                    rng=key, training=True)
            return nj_ode_loss_dense(b.values, preds, before, b.mask,
                                     ignore_first_continuity=True,
                                     moment_weights=[1.0, 10.0])
        loss, g = jax.value_and_grad(f)(p)
        up, o = tx.update(g, o, p)
        return optax.apply_updates(p, up), o, loss

    losses = []
    for i in range(60):
        params, opt, loss = step(params, opt, jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.5 * losses[0], losses[::10]

"""Fused grid-walk kernel (ops/walk_scan.py) vs the XLA walk.

The kernel pair must reproduce the XLA grid walk (itself pinned against the
per-gap reference semantics in tests/test_grid_walk.py) for forward values
AND parameter gradients — the backward kernel reconstructs every cell from
the forward's own arrive stream, so these tests fuzz exactly that algebra.
Runs in Pallas interpret mode on CPU.
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
    return simulate_batch(jax.random.PRNGKey(key), n, "black_scholes", 0.25,
                          T=1.0, n_steps=n_steps, mu=0.1, sigma=0.4, x0=1.0)


def _models(dt, **kw):
    """(XLA-walk, kernel-walk) pair with identical weights."""
    common = dict(input_dim=1, hidden_dim=18, output_dim=1, num_moments=2,
                  dt_ode_step=dt, t_max=1.0, grid_walk=True, **kw)
    m_x = NeuralJumpODE(use_pallas=False, **common)
    m_k = NeuralJumpODE(use_pallas="interpret", **common)
    assert m_k._use_walk_kernel()
    params = m_x.init(jax.random.PRNGKey(3))
    return m_x, m_k, params


@pytest.mark.parametrize("shared,act,scaling", [
    (True, "relu", "identity"),     # the production config's shape
    (False, "relu", "identity"),
    (False, "tanh", "tanh"),
    (True, "sigmoid", "sigmoid"),
])
def test_walk_kernel_forward_parity(shared, act, scaling):
    b = _aligned_batch(n_steps=20)
    m_x, m_k, params = _models(0.05, shared_network=shared, activation=act,
                               input_scaling=scaling)
    pa, pb = m_x.apply(params, b.times, b.values, b.mask)
    ka, kb = m_k.apply(params, b.times, b.values, b.mask)
    np.testing.assert_array_equal(np.asarray(pa), np.asarray(ka))
    np.testing.assert_allclose(np.asarray(kb), np.asarray(pb),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("shared", [True, False])
def test_walk_kernel_grad_parity(shared):
    """Parameter gradients of the dense loss match the XLA walk's."""
    b = _aligned_batch(n=10, n_steps=12, key=4)
    m_x, m_k, params = _models(1.0 / 12, shared_network=shared)

    def loss_fn(model):
        def f(p):
            preds, before = model.apply(p, b.times, b.values, b.mask)
            return nj_ode_loss_dense(b.values, preds, before, b.mask,
                                     ignore_first_continuity=True,
                                     moment_weights=[1.0, 10.0])
        return f

    lx, gx = jax.value_and_grad(loss_fn(m_x))(params)
    lk, gk = jax.value_and_grad(loss_fn(m_k))(params)
    np.testing.assert_allclose(float(lk), float(lx), rtol=1e-5)
    fx = jax.flatten_util.ravel_pytree(gx)[0]
    fk = jax.flatten_util.ravel_pytree(gk)[0]
    scale = float(jnp.max(jnp.abs(fx)))
    np.testing.assert_allclose(np.asarray(fk), np.asarray(fx),
                               rtol=2e-3, atol=2e-4 * scale)


def test_walk_kernel_tail_chunk_and_endpoint():
    """M not a multiple of the DMA chunk: the endpoint observation's cell
    lands INSIDE the padded stream window, where the backward's unwritten
    ring positions must stay zero (its jump cotangent flows only through
    the after-jump readout, not the walk)."""
    from njode_tpu.ops.walk_scan import CHUNK
    n_steps = 10
    assert n_steps % CHUNK != 0
    b = _aligned_batch(n=8, n_steps=n_steps, key=7)
    m_x, m_k, params = _models(1.0 / n_steps)

    def f(model):
        def g(p):
            _, before = model.apply(p, b.times, b.values, b.mask)
            return jnp.sum(before ** 2)
        return g

    np.testing.assert_allclose(float(f(m_k)(params)), float(f(m_x)(params)),
                               rtol=1e-5)
    gx = jax.flatten_util.ravel_pytree(jax.grad(f(m_x))(params))[0]
    gk = jax.flatten_util.ravel_pytree(jax.grad(f(m_k))(params))[0]
    scale = float(jnp.max(jnp.abs(gx)))
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gx),
                               rtol=2e-3, atol=2e-4 * scale)


def test_walk_kernel_ragged_mask():
    """End-padded ragged batches (dump-cell scatter) match the XLA walk at
    valid slots."""
    rng = np.random.default_rng(11)
    bt, bv = [], []
    for n_obs in (3, 6, 9, 2):
        idx = np.sort(rng.choice(np.arange(1, 16), n_obs - 2, replace=False))
        idx = np.concatenate([[0], idx, [16]])
        bt.append(jnp.asarray(idx, jnp.float32) * 0.0625)
        bv.append(jnp.asarray(rng.normal(size=(n_obs, 1)) * 0.3 + 1.0,
                              jnp.float32))
    times, values, mask = pad_ragged(bt, bv, jnp.float32)
    m_x, m_k, params = _models(0.0625)
    _, pb = m_x.apply(params, times, values, mask)
    _, kb = m_k.apply(params, times, values, mask)
    valid = np.asarray(mask)[:, :, None, None]
    np.testing.assert_allclose(np.asarray(kb) * valid, np.asarray(pb) * valid,
                               rtol=2e-4, atol=2e-5)


def test_walk_kernel_row_tiling():
    """Row counts above one tile split the grid; results identical."""
    from njode_tpu.ops import walk_scan
    b = _aligned_batch(n=40, n_steps=8, key=9)
    m_x, m_k, params = _models(0.125)
    _, pb = m_x.apply(params, b.times, b.values, b.mask)
    old = walk_scan.MAX_ROW_TILE
    try:
        walk_scan.MAX_ROW_TILE = 16   # forces 3 row tiles for 40 rows
        _, kb = m_k.apply(params, b.times, b.values, b.mask)
    finally:
        walk_scan.MAX_ROW_TILE = old
    np.testing.assert_allclose(np.asarray(kb), np.asarray(pb),
                               rtol=2e-4, atol=2e-5)


def test_walk_kernel_eligibility():
    from njode_tpu.ops.walk_scan import walk_scan_available
    ok = dict(n_hidden_layers=1, activation="relu", dropout_rate=0.0,
              input_scaling="identity", input_dim=1, hidden_dim=50)
    assert walk_scan_available(**ok)
    assert not walk_scan_available(**{**ok, "n_hidden_layers": 2})
    assert not walk_scan_available(**{**ok, "dropout_rate": 0.1})
    assert not walk_scan_available(**{**ok, "input_dim": 2})
    assert not walk_scan_available(**{**ok, "hidden_dim": 126})
    assert not walk_scan_available(**{**ok, "activation": "gelu"})

    # model-level gating: solver/dtype/off-mode all refuse
    base = dict(input_dim=1, hidden_dim=18, output_dim=1, num_moments=2,
                dt_ode_step=0.05, t_max=1.0, grid_walk=True)
    assert not NeuralJumpODE(use_pallas=False, **base)._use_walk_kernel()
    assert not NeuralJumpODE(use_pallas="interpret", ode_solver="rk4",
                             **base)._use_walk_kernel()
    assert not NeuralJumpODE(use_pallas="interpret",
                             compute_dtype="bfloat16",
                             **base)._use_walk_kernel()
    assert NeuralJumpODE(use_pallas="interpret", **base)._use_walk_kernel()


@pytest.mark.parametrize("hidden,n", [
    (66, 9),    # unpaired lane layout (d_h + 3 > 64 -> n_halves = 1)
    (18, 7),    # paired layout with an ODD batch (one padded half row)
])
def test_walk_kernel_layout_variants(hidden, n):
    """Both lane layouts (paired / unpaired) and odd batch sizes match the
    XLA walk for values and gradients."""
    from njode_tpu.ops.walk_scan import n_halves
    assert n_halves(66) == 1 and n_halves(18) == 2
    b = _aligned_batch(n=n, n_steps=12, key=5)
    common = dict(input_dim=1, hidden_dim=hidden, output_dim=1,
                  num_moments=2, dt_ode_step=1.0 / 12, t_max=1.0,
                  grid_walk=True, shared_network=True)
    m_x = NeuralJumpODE(use_pallas=False, **common)
    m_k = NeuralJumpODE(use_pallas="interpret", **common)
    params = m_x.init(jax.random.PRNGKey(2))

    def f(model):
        def g(p):
            preds, before = model.apply(p, b.times, b.values, b.mask)
            return nj_ode_loss_dense(b.values, preds, before, b.mask,
                                     ignore_first_continuity=True,
                                     moment_weights=[1.0, 10.0])
        return g

    lx, gx = jax.value_and_grad(f(m_x))(params)
    lk, gk = jax.value_and_grad(f(m_k))(params)
    np.testing.assert_allclose(float(lk), float(lx), rtol=1e-5)
    fx = jax.flatten_util.ravel_pytree(gx)[0]
    fk = jax.flatten_util.ravel_pytree(gk)[0]
    scale = float(jnp.max(jnp.abs(fx)))
    np.testing.assert_allclose(np.asarray(fk), np.asarray(fx),
                               rtol=2e-3, atol=2e-4 * scale)

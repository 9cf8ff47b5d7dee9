"""Fused whole-step kernel (ops/fused_step.py) vs the XLA path.

Runs in Pallas interpreter mode on CPU.  Pins forward values, parameter
gradients through a realistic masked loss, dtype/config gating, and the
eligibility fallbacks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from njode_tpu import NeuralJumpODE, nj_ode_loss
from njode_tpu.models.loss import nj_ode_loss_dense
from njode_tpu.ops import fused_step_available

MODEL_KW = dict(input_dim=1, hidden_dim=24, output_dim=1, num_moments=2,
                n_hidden_layers=1)


def _models(**kw):
    cfg = dict(MODEL_KW)
    cfg.update(kw)
    xla = NeuralJumpODE(**cfg)
    fused = NeuralJumpODE(use_pallas="step-interpret", **cfg)
    assert fused._use_fused_step(5)
    params = xla.init(jax.random.PRNGKey(0))
    return xla, fused, params


def _batch(B, N, seed=1, d_x=1):
    kt, kv = jax.random.split(jax.random.PRNGKey(seed))
    times = jnp.sort(jax.random.uniform(kt, (B, N)), axis=1)
    times = times.at[:, 0].set(0.0)
    values = jax.random.normal(kv, (B, N, d_x)) + 1.0
    return times, values


@pytest.mark.parametrize("N", [1, 2, 5, 11])
def test_forward_parity(N):
    xla, fused, params = _models()
    times, values = _batch(7, N)
    p_ref, pb_ref = xla.apply(params, times, values)
    p_f, pb_f = fused.apply(params, times, values)
    np.testing.assert_allclose(np.asarray(p_f), np.asarray(p_ref),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(pb_f), np.asarray(pb_ref),
                               rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("act,scaling", [("relu", "identity"),
                                         ("tanh", "tanh"),
                                         ("elu", "sigmoid")])
def test_forward_parity_act_scaling(act, scaling):
    xla, fused, params = _models(activation=act, input_scaling=scaling)
    times, values = _batch(5, 4, seed=3)
    p_ref, pb_ref = xla.apply(params, times, values)
    p_f, pb_f = fused.apply(params, times, values)
    np.testing.assert_allclose(np.asarray(p_f), np.asarray(p_ref),
                               rtol=5e-5, atol=5e-6)
    np.testing.assert_allclose(np.asarray(pb_f), np.asarray(pb_ref),
                               rtol=5e-5, atol=5e-6)


@pytest.mark.parametrize("act,scaling", [("relu", "identity"),
                                         ("tanh", "sigmoid")])
def test_gradient_parity(act, scaling):
    """Parameter gradients through the training loss match the XLA path."""
    xla, fused, params = _models(activation=act, input_scaling=scaling)
    times, values = _batch(6, 5, seed=5)
    mask = jnp.ones(times.shape, bool).at[-1, -2:].set(False)

    def loss(model):
        def f(p):
            preds, before = model.apply(p, times, values, mask)
            return nj_ode_loss_dense(values, preds, before, mask,
                                     ignore_first_continuity=True,
                                     moment_weights=[1.0, 10.0])
        return f

    l_ref, g_ref = jax.value_and_grad(loss(xla))(params)
    l_f, g_f = jax.value_and_grad(loss(fused))(params)
    np.testing.assert_allclose(float(l_f), float(l_ref), rtol=1e-5)
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_ref),
            jax.tree_util.tree_leaves_with_path(g_f)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-4, atol=1e-5,
            err_msg=f"gradient mismatch at {jax.tree_util.keystr(ka)}")


@pytest.mark.parametrize("N", [1, 2, 5, 11])
def test_shared_forward_parity(N):
    """Shared-network mode: one network pass, K readout columns."""
    xla, fused, params = _models(shared_network=True)
    times, values = _batch(7, N)
    p_ref, pb_ref = xla.apply(params, times, values)
    p_f, pb_f = fused.apply(params, times, values)
    np.testing.assert_allclose(np.asarray(p_f), np.asarray(p_ref),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(pb_f), np.asarray(pb_ref),
                               rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("act,scaling", [("relu", "identity"),
                                         ("tanh", "sigmoid")])
def test_shared_gradient_parity(act, scaling):
    """Shared-mode parameter gradients (the o2 cotangents are per-moment
    while everything upstream sums over moments) match the XLA path."""
    xla, fused, params = _models(shared_network=True, activation=act,
                                 input_scaling=scaling)
    times, values = _batch(6, 5, seed=5)
    mask = jnp.ones(times.shape, bool).at[-1, -2:].set(False)

    def loss(model):
        def f(p):
            preds, before = model.apply(p, times, values, mask)
            return nj_ode_loss_dense(values, preds, before, mask,
                                     ignore_first_continuity=True,
                                     moment_weights=[1.0, 10.0])
        return f

    l_ref, g_ref = jax.value_and_grad(loss(xla))(params)
    l_f, g_f = jax.value_and_grad(loss(fused))(params)
    np.testing.assert_allclose(float(l_f), float(l_ref), rtol=1e-5)
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_ref),
            jax.tree_util.tree_leaves_with_path(g_f)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-4, atol=1e-5,
            err_msg=f"gradient mismatch at {jax.tree_util.keystr(ka)}")


def test_gradient_parity_under_jit_train_step():
    """One jitted Adam step produces the same parameters as the XLA path."""
    import optax

    xla, fused, params = _models()
    times, values = _batch(8, 3, seed=7)
    tx = optax.adam(1e-3)

    def stepped(model):
        opt = tx.init(params)

        @jax.jit
        def step(p, s):
            def f(pp):
                pr, pb = model.apply(pp, times, values)
                return nj_ode_loss_dense(values, pr, pb,
                                         jnp.ones(times.shape, bool),
                                         moment_weights=[1.0, 10.0])
            loss, g = jax.value_and_grad(f)(p)
            u, s = tx.update(g, s, p)
            return optax.apply_updates(p, u), s, loss
        p, _, loss = step(params, opt)
        return p, float(loss)

    p_ref, l_ref = stepped(xla)
    p_f, l_f = stepped(fused)
    np.testing.assert_allclose(l_f, l_ref, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p_ref),
                    jax.tree_util.tree_leaves(p_f)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("shared", [False, True])
def test_pack_unpack_roundtrip(shared):
    """unpack(pack(params)) reproduces the pytree exactly."""
    from njode_tpu.ops.fused_step import pack_params, unpack_params

    m = NeuralJumpODE(shared_network=shared, **MODEL_KW)
    params = m.init(jax.random.PRNGKey(2))
    W, V, bo2 = pack_params(params, num_moments=2, hidden_dim=24,
                            shared_network=shared)
    back = unpack_params(W, V, bo2, num_moments=2, hidden_dim=24,
                         shared_network=shared)
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_leaves_with_path(params),
            jax.tree_util.tree_leaves_with_path(back)):
        assert a.shape == b.shape, (jax.tree_util.keystr(ka), a.shape, b.shape)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=jax.tree_util.keystr(ka))


@pytest.mark.parametrize("shared", [False, True])
def test_packed_state_training(shared):
    """Training directly on the padded (W, V, bo2) state matches pytree
    training step-for-step, and the padding stays EXACTLY zero (the
    property that makes padded tensors safe as a train state)."""
    import optax
    from njode_tpu.ops.fused_step import (fused_step_apply_packed,
                                          pack_params, unpack_params)
    from njode_tpu.utils.training import make_adam

    H = MODEL_KW["hidden_dim"]
    xla, fused, params = _models(shared_network=shared)
    times, values = _batch(8, 4, seed=11)
    mask = jnp.ones(times.shape, bool)
    tx = make_adam(1e-3, 5e-4)

    def pytree_loss(p):
        pr, pb = fused.apply(p, times, values, mask)
        return nj_ode_loss_dense(values, pr, pb, mask,
                                 moment_weights=[1.0, 10.0])

    def packed_loss(st):
        W, V, bo2 = st
        pr, pb = fused_step_apply_packed(
            W, V, bo2, times, values, num_moments=2, activation="relu",
            input_scaling="identity", interpret=True, shared_network=shared)
        return nj_ode_loss_dense(values, pr, pb, mask,
                                 moment_weights=[1.0, 10.0])

    p = params
    opt_p = tx.init(p)
    st = pack_params(params, num_moments=2, hidden_dim=H,
                     shared_network=shared)
    pad_mask = jax.tree_util.tree_map(lambda x: x == 0.0, st)
    opt_s = tx.init(st)
    for _ in range(3):
        _, g = jax.value_and_grad(pytree_loss)(p)
        u, opt_p = tx.update(g, opt_p, p)
        p = optax.apply_updates(p, u)

        _, gs = jax.value_and_grad(packed_loss)(st)
        us, opt_s = tx.update(gs, opt_s, st)
        st = optax.apply_updates(st, us)

    # padded entries that started at zero never moved
    for x, mask0 in zip(st, pad_mask):
        assert np.all(np.asarray(x)[np.asarray(mask0)] == 0.0)
    back = unpack_params(*st, num_moments=2, hidden_dim=H,
                         shared_network=shared)
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_leaves_with_path(p),
            jax.tree_util.tree_leaves_with_path(back)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-6, atol=1e-7,
            err_msg=f"packed-state drift at {jax.tree_util.keystr(ka)}")


def test_bf16_mode_close_to_xla_bf16():
    """compute_dtype=bfloat16: fused forward tracks the XLA bf16 path at
    bf16 tolerance."""
    cfg = dict(MODEL_KW, compute_dtype="bfloat16")
    xla = NeuralJumpODE(**cfg)
    fused = NeuralJumpODE(use_pallas="step-interpret", **cfg)
    assert fused._use_fused_step(4)
    params = xla.init(jax.random.PRNGKey(0))
    times, values = _batch(6, 4, seed=9)
    p_ref, _ = xla.apply(params, times, values)
    p_f, _ = fused.apply(params, times, values)
    np.testing.assert_allclose(np.asarray(p_f), np.asarray(p_ref),
                               rtol=0.03, atol=0.03)
    # and its gradients are finite and match XLA-bf16 loosely
    def f(model):
        def g(p):
            pr, pb = model.apply(p, times, values)
            return nj_ode_loss_dense(values, pr, pb,
                                     jnp.ones(times.shape, bool),
                                     moment_weights=[1.0, 10.0])
        return jax.grad(g)(params)
    g_ref, g_f = f(xla), f(fused)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_f)):
        assert np.isfinite(np.asarray(b)).all()
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=0.25, atol=0.25)


def test_eligibility_gating():
    """Ineligible configs silently use the XLA path (no kernel, no error)."""
    assert fused_step_available(True, 1, 1, 1, "relu", 0.0, "identity",
                                None)              # shared network: eligible (r3)
    assert fused_step_available(False, 2, 1, 1, "relu", 0.0, "identity",
                                None)              # d_x > 1: eligible (r5)
    assert fused_step_available(False, 1, 1, 2, "relu", 0.0, "identity",
                                None)              # deeper MLPs: eligible (r5)
    assert not fused_step_available(False, 1, 1, 1, "relu", 0.5, "identity",
                                    None)          # dropout
    assert not fused_step_available(False, 1, 1, 1, "relu", 0.0, "identity",
                                    0.01)          # substep loop
    assert not fused_step_available(False, 1, 1, 1, "relu", 0.0, "identity",
                                    None, "rk4")   # higher-order solver

    # shared-mode K is bounded by the OUTPUT-lane packing (the dynamic V
    # layout grows with K since r5): K=7 at N=5 packs (63 lanes), a K that
    # overflows the 128 output lanes does not
    m7 = NeuralJumpODE(use_pallas="step-interpret", input_dim=1,
                       hidden_dim=8, output_dim=1,
                       num_moments=7, shared_network=True)
    assert m7._use_fused_step(5)
    m_many = NeuralJumpODE(use_pallas="step-interpret", input_dim=1,
                           hidden_dim=8, output_dim=1,
                           num_moments=15, shared_network=True)
    assert not m_many._use_fused_step(5)           # 15*9 = 135 > 128 lanes

    # wide input dims overflow the INPUT-lane packing at large N
    m_wide = NeuralJumpODE(use_pallas="step-interpret", input_dim=30,
                           hidden_dim=8, output_dim=1, num_moments=2)
    assert not m_wide._use_fused_step(5)           # 5*31 = 155 > 128 lanes
    assert m_wide._use_fused_step(4)               # 4*31 = 124 fits


def test_layout_legacy_compat():
    """StepLayout(d_x=1, d_y=1, L=1) reproduces the legacy row/plane
    constants exactly — ops/train_kernel.py and packed train-state
    checkpoints build on them."""
    from njode_tpu.ops import fused_step as fs

    lo = fs.StepLayout(1, 1, 1, 2, False)
    assert lo.row_j1 == fs.ROW_J1
    assert lo.row_bj == [fs.ROW_BJ1, fs.ROW_BJ2]
    assert lo.row_w1x == fs.ROW_W1X
    assert lo.row_w1t == fs.ROW_W1T
    assert lo.row_w1d == fs.ROW_W1D
    assert lo.row_ode_b == [fs.ROW_B1, fs.ROW_B2]
    assert lo.row_bo == [fs.ROW_BO1]
    assert lo.row_o2 == fs.ROW_O2
    assert lo.n_vec == fs.N_VEC
    assert lo.mat_jump == [fs.MAT_J2]
    assert lo.mat_out == [fs.MAT_O1]
    assert lo.mat_w1h == fs.MAT_W1H
    assert lo.mat_ode_last == fs.MAT_W2
    assert lo.n_mats == 4


# (input_dim, output_dim, n_hidden_layers, shared) beyond the legacy gate
WIDE_CFGS = [(2, 2, 1, False), (1, 1, 2, False), (2, 2, 2, False),
             (3, 1, 1, False), (2, 2, 2, True), (1, 1, 3, True)]


@pytest.mark.parametrize("d_x,d_y,L,shared", WIDE_CFGS)
def test_wide_forward_parity(d_x, d_y, L, shared):
    """d_x > 1 / d_y > 1 / deeper MLPs (r5): forward matches XLA."""
    xla, fused, params = _models(input_dim=d_x, output_dim=d_y,
                                 n_hidden_layers=L, shared_network=shared)
    times, values = _batch(7, 5, seed=2, d_x=d_x)
    p_ref, pb_ref = xla.apply(params, times, values)
    p_f, pb_f = fused.apply(params, times, values)
    np.testing.assert_allclose(np.asarray(p_f), np.asarray(p_ref),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(pb_f), np.asarray(pb_ref),
                               rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("d_x,d_y,L,shared",
                         [(2, 2, 1, False), (1, 1, 2, False),
                          (2, 2, 2, True)])
def test_wide_gradient_parity(d_x, d_y, L, shared):
    """Parameter gradients for the widened configs match the XLA path."""
    xla, fused, params = _models(input_dim=d_x, output_dim=d_y,
                                 n_hidden_layers=L, shared_network=shared,
                                 activation="tanh", input_scaling="tanh")
    times, values = _batch(6, 4, seed=5, d_x=d_x)
    mask = jnp.ones(times.shape, bool).at[-1, -2:].set(False)

    def loss(model):
        def f(p):
            preds, before = model.apply(p, times, values, mask)
            return nj_ode_loss_dense(values, preds, before, mask,
                                     ignore_first_continuity=True,
                                     moment_weights=[1.0, 10.0])
        return f

    l_ref, g_ref = jax.value_and_grad(loss(xla))(params)
    l_f, g_f = jax.value_and_grad(loss(fused))(params)
    np.testing.assert_allclose(float(l_f), float(l_ref), rtol=1e-5)
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_ref),
            jax.tree_util.tree_leaves_with_path(g_f)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-4, atol=1e-5,
            err_msg=f"gradient mismatch at {jax.tree_util.keystr(ka)}")


@pytest.mark.parametrize("d_x,d_y,L,shared", WIDE_CFGS)
def test_wide_pack_unpack_roundtrip(d_x, d_y, L, shared):
    from njode_tpu.ops.fused_step import pack_params, unpack_params

    m = NeuralJumpODE(input_dim=d_x, hidden_dim=24, output_dim=d_y,
                      num_moments=2, n_hidden_layers=L,
                      shared_network=shared)
    params = m.init(jax.random.PRNGKey(2))
    kw = dict(num_moments=2, hidden_dim=24, shared_network=shared,
              input_dim=d_x, output_dim=d_y, n_hidden_layers=L)
    W, V, bo2 = pack_params(params, **kw)
    back = unpack_params(W, V, bo2, **kw)
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_leaves_with_path(params),
            jax.tree_util.tree_leaves_with_path(back)):
        assert a.shape == b.shape, (jax.tree_util.keystr(ka), a.shape, b.shape)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=jax.tree_util.keystr(ka))


def test_dropout_training_falls_back():
    """rng-carrying training calls bypass the kernel (dropout needs rng)."""
    cfg = dict(MODEL_KW, dropout_rate=0.3)
    fused = NeuralJumpODE(use_pallas="step-interpret", **cfg)
    assert not fused._use_fused_step(4)  # ineligible via dropout
    params = fused.init(jax.random.PRNGKey(0))
    times, values = _batch(3, 4)
    p, _ = fused.apply(params, times, values, rng=jax.random.PRNGKey(1),
                       training=True)
    assert np.isfinite(np.asarray(p)).all()


def test_padded_rows_and_mask_slots():
    """End-padded (masked) slots produce the same loss as the XLA path —
    padding repeats the last time so gap dt=0 inside the kernel."""
    from njode_tpu.models.jump_ode import pad_ragged

    xla, fused, params = _models()
    bt = [jnp.asarray([0.0, 0.3, 0.7, 1.0]), jnp.asarray([0.0, 0.5])]
    bv = [jnp.ones((4, 1)), jnp.full((2, 1), 2.0)]
    times, values, mask = pad_ragged(bt, bv)
    p_ref, pb_ref = xla.apply(params, times, values, mask)
    p_f, pb_f = fused.apply(params, times, values, mask)
    l_ref = nj_ode_loss(times, values, p_ref, pb_ref, mask=mask)
    l_f = nj_ode_loss(times, values, p_f, pb_f, mask=mask)
    np.testing.assert_allclose(float(l_f), float(l_ref), rtol=1e-5)


def test_non_divisor_tile_override(monkeypatch):
    """Env-overridden forward/backward row tiles need not divide each
    other: the pad target must be a whole number of BOTH (the lcm), or
    one grid silently skips trailing rows (regression: tile_lcm was
    computed as max())."""
    from njode_tpu.ops import fused_step as fs
    monkeypatch.setattr(fs, "ROW_TILE", 24)
    monkeypatch.setattr(fs, "ROW_TILE_BWD", 16)   # lcm 48, max 24
    xla, fused, params = _models()
    times, values = _batch(30, 4, seed=5)         # > one bwd tile of rows

    def loss(m, p):
        preds, preds_before = m.apply(p, times, values)
        return nj_ode_loss(times, values, preds, preds_before)

    l_ref, g_ref = jax.value_and_grad(loss, argnums=1)(xla, params)
    l_f, g_f = jax.value_and_grad(loss, argnums=1)(fused, params)
    np.testing.assert_allclose(np.asarray(l_f), np.asarray(l_ref),
                               rtol=5e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_f)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=5e-5)


def test_auto_engages_fused_step_in_measured_regime(monkeypatch):
    """use_pallas='auto' routes apply through the fused-step kernel exactly
    in its measured-win regime (hidden >= 192 with >= 4096 folded rows on
    real TPU — BENCH_NOTES.md r3d/r4c boundary sweeps + the r5f min-of-5
    quiet-box pin that resolved the hidden-192 straddle as a 1.21x win)
    and stays on XLA everywhere else."""
    import jax as _jax

    def mk(hidden, **kw):
        return NeuralJumpODE(input_dim=1, hidden_dim=hidden, output_dim=1,
                             num_moments=2, use_pallas="auto", **kw)

    m = mk(256)
    # off-TPU (CPU CI): never engages
    assert m._use_fused_step(2, n_rows=4096) is False

    monkeypatch.setattr(_jax, "default_backend", lambda: "tpu")
    assert m._use_fused_step(2, n_rows=4096) is True
    # below the measured row boundary -> XLA
    assert m._use_fused_step(2, n_rows=512) is False
    # below the measured hidden boundary -> XLA (160 measured 0.92x, r4c)
    assert mk(128)._use_fused_step(2, n_rows=4096) is False
    assert mk(160)._use_fused_step(2, n_rows=4096) is False
    # boundary point hidden 192: 1.21x in the r5f min-of-5 pin -> engages
    assert mk(192)._use_fused_step(2, n_rows=4096) is True
    assert mk(224)._use_fused_step(2, n_rows=4096) is True
    # ineligible model configs stay on XLA even in the win regime
    assert mk(256, dropout_rate=0.3)._use_fused_step(2, n_rows=4096) is False
    assert mk(256, dt_ode_step=0.01)._use_fused_step(2, n_rows=4096) is False
    # shared-network mode measured SLOWER in-kernel (0.91x, BENCH_NOTES
    # r3b) — auto must never engage it; explicit 'step' still does
    m_sh = mk(256, shared_network=True)
    assert m_sh._use_fused_step(2, n_rows=4096) is False
    m_sh_exp = NeuralJumpODE(input_dim=1, hidden_dim=256, output_dim=1,
                             num_moments=2, use_pallas="step",
                             shared_network=True)
    assert m_sh_exp._use_fused_step(2, n_rows=4096) is True
    # too many slots for the lane packing
    assert m._use_fused_step(70, n_rows=4096) is False
    # explicit modes unchanged by the n_rows argument
    ms = NeuralJumpODE(input_dim=1, hidden_dim=32, output_dim=1,
                       num_moments=2, use_pallas="step-interpret")
    assert ms._use_fused_step(2) is True


# ---------------------------------------------------------------- lane loss

LOSS_CFGS = [
    # (d, L, K, shared, N, variance_method, extended, ignore_first)
    (1, 1, 2, False, 5, "direct", False, True),
    (1, 1, 2, False, 1, "direct", False, False),
    (2, 1, 2, False, 4, "direct", False, True),
    (2, 2, 2, False, 3, "second_moment", False, True),
    (1, 1, 3, False, 4, "direct", True, True),
    (1, 1, 2, True, 5, "direct", False, True),
    (3, 1, 3, True, 3, "second_moment", True, False),
]


@pytest.mark.parametrize("d,L,K,shared,N,varm,ext,ifc", LOSS_CFGS)
def test_lane_space_loss_parity(d, L, K, shared, N, varm, ext, ifc):
    """fused_step_loss == model.apply + nj_ode_loss_dense (value AND grads).

    The lane-space loss (r5i) selects moment planes straight from the
    kernel's (B, LANES) output with constant 0/1 matmuls so the (B, N, d, K)
    prediction tensor (and its cotangent) is never materialized; this pins
    that the rewritten math is the SAME loss — masked slots, padded
    trajectories, both variance modes, extended moments, slot-0 before-jump
    conventions, eps-inside-sqrt reduction order.
    """
    from njode_tpu.ops import fused_step_loss

    model = NeuralJumpODE(input_dim=d, output_dim=d, hidden_dim=24,
                          num_moments=K, n_hidden_layers=L,
                          shared_network=shared)
    params = model.init(jax.random.PRNGKey(hash((d, L, K)) % 1000))
    times, values = _batch(6, N, seed=11, d_x=d)
    mask = jnp.ones((6, N), bool)
    if N > 2:
        mask = mask.at[-1, -2:].set(False)
    traj_mask = jnp.ones((6,), bool).at[-2].set(False)
    mw = [1.0] + [10.0] * (K - 1)
    kw = dict(ignore_first_continuity=ifc, moment_weights=mw,
              variance_method=varm, traj_mask=traj_mask,
              extended_moments=ext)

    def ref_loss(p):
        preds, before = model.apply(p, times, values, mask)
        return nj_ode_loss_dense(values, preds, before, mask, **kw)

    def lane_loss(p):
        return fused_step_loss(
            p, times, values, mask, num_moments=K, hidden_dim=24,
            activation="relu", input_scaling="identity", interpret=True,
            shared_network=shared, input_dim=d, output_dim=d,
            n_hidden_layers=L, **kw)

    v_ref, g_ref = jax.value_and_grad(ref_loss)(params)
    v_f, g_f = jax.value_and_grad(lane_loss)(params)
    np.testing.assert_allclose(float(v_f), float(v_ref), rtol=1e-5)
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_ref),
            jax.tree_util.tree_leaves_with_path(g_f)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-4, atol=1e-5,
            err_msg=f"gradient mismatch at {jax.tree_util.keystr(ka)}")


def test_lane_space_loss_rejects_mismatched_dims():
    from njode_tpu.ops import fused_step_loss

    model = NeuralJumpODE(input_dim=2, output_dim=1, hidden_dim=24,
                          num_moments=2)
    params = model.init(jax.random.PRNGKey(0))
    times, values = _batch(4, 3, d_x=2)
    with pytest.raises(ValueError, match="output_dim == input_dim"):
        fused_step_loss(params, times, values, num_moments=2, hidden_dim=24,
                        activation="relu", input_scaling="identity",
                        interpret=True, input_dim=2, output_dim=1)


def test_apply_loss_dispatch_and_fallback():
    """model.apply_loss: lane-space path where the kernel carries the
    forward; silent composed fallback for d_y != d_x and dropout+rng."""
    xla, fused, params = _models()
    times, values = _batch(6, 5, seed=7)
    mask = jnp.ones(times.shape, bool).at[-1, -1:].set(False)
    kw = dict(ignore_first_continuity=True, moment_weights=[1.0, 10.0])

    preds, before = xla.apply(params, times, values, mask)
    ref = float(nj_ode_loss_dense(values, preds, before, mask, **kw))
    got = float(fused.apply_loss(params, times, values, mask, **kw))
    np.testing.assert_allclose(got, ref, rtol=1e-5)

    # mismatched dims: apply_loss must FALL BACK, not raise
    cfg = dict(MODEL_KW, input_dim=2, output_dim=1)
    m2 = NeuralJumpODE(use_pallas="step-interpret", **cfg)
    assert m2._use_fused_step(4)
    p2 = m2.init(jax.random.PRNGKey(1))
    t2, v2 = _batch(5, 4, seed=9, d_x=2)
    pr, pb = m2.apply(p2, t2, v2)
    ref2 = float(nj_ode_loss_dense(v2, pr, pb, None, **kw))
    got2 = float(m2.apply_loss(p2, t2, v2, **kw))
    np.testing.assert_allclose(got2, ref2, rtol=1e-5)

    # dropout + rng: training path needs per-layer rng -> composed fallback
    m3 = NeuralJumpODE(use_pallas="step-interpret",
                       **dict(MODEL_KW, dropout_rate=0.4))
    p3 = m3.init(jax.random.PRNGKey(2))
    rng = jax.random.PRNGKey(3)
    pr3, pb3 = m3.apply(p3, times, values, mask, rng=rng, training=True)
    ref3 = float(nj_ode_loss_dense(values, pr3, pb3, mask, **kw))
    got3 = float(m3.apply_loss(p3, times, values, mask, rng=rng,
                               training=True, **kw))
    np.testing.assert_allclose(got3, ref3, rtol=1e-5)

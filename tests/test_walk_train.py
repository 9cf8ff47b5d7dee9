"""Whole-run PRODUCTION training kernel (ops/walk_train.py) vs the XLA
trainer: shared network + fixed dt_ode_step substeps on grid-aligned data.

Runs in Pallas interpreter mode on CPU.  Pins the full composed semantics:
per-minibatch losses AND the final parameters after G fused
jump+walk+readout+loss-gradient+backward+Adam steps must match an optax
reference loop (model.apply with grid_walk + nj_ode_loss_dense +
make_adam) step-for-step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from njode_tpu import NeuralJumpODE
from njode_tpu.models.loss import nj_ode_loss_dense
from njode_tpu.ops.train_kernel import pack_minibatches
from njode_tpu.ops.walk_train import (fused_walk_train_run, init_walk_state,
                                      optax_state_into_walk,
                                      pack_walk_params, unpack_walk_params,
                                      walk_state_from, walk_train_available,
                                      walk_train_shapes_ok)
from njode_tpu.simulation import simulate_batch
from njode_tpu.utils.training import make_adam

H, N, BS = 12, 5, 16          # hidden 12 -> row-pair packing (nh = 2)
DT = 0.05                     # n_steps = 20 grid -> every obs time aligned
M = 20


def _data(n_traj, seed=0):
    batch = simulate_batch(jax.random.PRNGKey(seed), n_traj, "black_scholes",
                           obs_fraction=N / 20.0, obs_only=True, n_steps=20,
                           mu=0.1, sigma=0.5, x0=1.0)
    assert batch.times.shape[1] == N
    return batch.times, batch.values


def _model(hidden=H, K=2, **kw):
    kw.setdefault("activation", "relu")
    return NeuralJumpODE(input_dim=1, hidden_dim=hidden, output_dim=1,
                         num_moments=K, shared_network=True,
                         dt_ode_step=DT, t_max=1.0, grid_walk=True, **kw)


def _reference_loop(model, params, times, values, valid, G, lr, wd,
                    variance_method="direct", K=2):
    tx = make_adam(lr, wd)
    opt = tx.init(params)
    losses = []
    mw = [1.0, 10.0][:K]
    for g in range(G):
        sl = slice(g * BS, (g + 1) * BS)
        t, v, tm = times[sl], values[sl], valid[sl]

        def loss_fn(p):
            pr, pb = model.apply(p, t, v)
            return nj_ode_loss_dense(v, pr, pb, None,
                                     ignore_first_continuity=True,
                                     moment_weights=mw,
                                     variance_method=variance_method,
                                     traj_mask=tm)

        l, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt = tx.update(grads, opt, params)
        params = optax.apply_updates(params, upd)
        losses.append(float(l))
    return params, losses


def _run_kernel(params, times, values, valid, G, lr, wd, hidden=H, K=2,
                variance_method="direct", split=None, **kw):
    data = pack_minibatches(times, values, valid, BS)
    st = init_walk_state(params, num_moments=K, hidden_dim=hidden)
    kw = dict(n_slots=N, num_moments=K, batch_size=BS, hidden_dim=hidden,
              dt_ode_step=DT, max_substeps=M, lr=lr, weight_decay=wd,
              moment_weights=[1.0, 10.0][:K],
              variance_method=variance_method, interpret=True, **kw)
    if split is None:
        st, losses = fused_walk_train_run(st, data, **kw)
    else:
        st, l1 = fused_walk_train_run(st, data[:split * BS], **kw)
        st, l2 = fused_walk_train_run(st, data[split * BS:], **kw)
        losses = jnp.concatenate([l1, l2])
    W, V = st[0], st[1]
    return unpack_walk_params(W, V, num_moments=K, hidden_dim=hidden), losses


def _assert_trees_close(p_ref, p_k, rtol=2e-4, atol=1e-5):
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_leaves_with_path(p_ref),
            jax.tree_util.tree_leaves_with_path(p_k)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=rtol, atol=atol,
            err_msg=f"param drift at {jax.tree_util.keystr(ka)}")


def test_chunked_ring_matches_direct_and_optax():
    """Checkpoint-recompute residual mode (r5): with the ring forced below
    M the kernel recomputes chunk residuals from checkpoints — the result
    must equal BOTH the direct-ring kernel (exactly: same arithmetic per
    cell, identical op order within a cell) and the optax loop (to the
    usual kernel tolerance), including a partial final chunk (ck=6, M=20
    -> chunks of 6/6/6/2)."""
    model = _model()
    params = model.init(jax.random.PRNGKey(3))
    G = 3
    times, values = _data(G * BS, seed=4)
    valid = jnp.ones((G * BS,), bool)

    p_direct, l_direct = _run_kernel(params, times, values, valid, G,
                                     1e-3, 5e-4)
    p_chunk, l_chunk = _run_kernel(params, times, values, valid, G,
                                   1e-3, 5e-4, ring_cells=6)
    for a, b in zip(jax.tree_util.tree_leaves(p_direct),
                    jax.tree_util.tree_leaves(p_chunk)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(l_direct), np.asarray(l_chunk))

    p_ref, l_ref = _reference_loop(model, params, times, values, valid, G,
                                   1e-3, 5e-4)
    _assert_trees_close(p_ref, p_chunk)
    np.testing.assert_allclose(np.asarray(l_chunk), np.asarray(l_ref),
                               rtol=2e-4)


def test_pack_roundtrip():
    for hidden, K in ((H, 2), (H, 1), (70, 2)):
        model = _model(hidden=hidden, K=K)
        params = model.init(jax.random.PRNGKey(0))
        W, V = pack_walk_params(params, num_moments=K, hidden_dim=hidden)
        back = unpack_walk_params(W, V, num_moments=K, hidden_dim=hidden)
        for a, b in zip(jax.tree_util.tree_leaves(params),
                        jax.tree_util.tree_leaves(back)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a))


@pytest.mark.parametrize("variance_method", ["direct", "second_moment"])
def test_matches_optax_loop(variance_method):
    G = 3
    times, values = _data(G * BS)
    valid = jnp.ones((G * BS,), bool)
    model = _model(variance_method=variance_method)
    params = model.init(jax.random.PRNGKey(0))

    p_ref, l_ref = _reference_loop(model, params, times, values, valid, G,
                                   1e-3, 5e-4, variance_method)
    p_k, l_k = _run_kernel(params, times, values, valid, G, 1e-3, 5e-4,
                           variance_method=variance_method)
    np.testing.assert_allclose(np.asarray(l_k), np.asarray(l_ref), rtol=2e-4)
    _assert_trees_close(p_ref, p_k)


@pytest.mark.parametrize("solver", ["heun", "rk4"])
def test_solver_matches_optax_loop(solver):
    """Higher-order solvers in-kernel (r5): the tableau-driven cell must
    match the XLA trainer running the same ode_solver — stage evaluations
    at t_elapsed = 0, w1's t_elapsed row getting an exactly-zero gradient
    (it only ever multiplies a zero feature), Adam included."""
    G = 3
    times, values = _data(G * BS, seed=11)
    valid = jnp.ones((G * BS,), bool)
    model = _model(ode_solver=solver)
    params = model.init(jax.random.PRNGKey(6))

    p_ref, l_ref = _reference_loop(model, params, times, values, valid, G,
                                   1e-3, 5e-4)
    p_k, l_k = _run_kernel(params, times, values, valid, G, 1e-3, 5e-4,
                           ode_solver=solver)
    np.testing.assert_allclose(np.asarray(l_k), np.asarray(l_ref), rtol=2e-4)
    _assert_trees_close(p_ref, p_k)


def test_rk4_chunked_ring_matches_direct():
    """Checkpoint-recompute residuals compose with the multi-stage cell:
    forcing the ring below M must reproduce the direct rk4 kernel
    bit-for-bit (same per-cell arithmetic, stages recomputed either way)."""
    model = _model(ode_solver="rk4")
    params = model.init(jax.random.PRNGKey(9))
    G = 2
    times, values = _data(G * BS, seed=12)
    valid = jnp.ones((G * BS,), bool)
    p_direct, l_direct = _run_kernel(params, times, values, valid, G,
                                     1e-3, 5e-4, ode_solver="rk4")
    p_chunk, l_chunk = _run_kernel(params, times, values, valid, G,
                                   1e-3, 5e-4, ode_solver="rk4",
                                   ring_cells=6)
    for a, b in zip(jax.tree_util.tree_leaves(p_direct),
                    jax.tree_util.tree_leaves(p_chunk)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(l_direct), np.asarray(l_chunk))


def test_matches_optax_loop_single_lane():
    """hidden > 61 -> nh = 1 (no row pairing): same parity."""
    hidden, G = 70, 2
    times, values = _data(G * BS, seed=4)
    valid = jnp.ones((G * BS,), bool)
    model = _model(hidden=hidden)
    params = model.init(jax.random.PRNGKey(2))
    p_ref, l_ref = _reference_loop(model, params, times, values, valid, G,
                                   1e-3, 5e-4)
    p_k, l_k = _run_kernel(params, times, values, valid, G, 1e-3, 5e-4,
                           hidden=hidden)
    np.testing.assert_allclose(np.asarray(l_k), np.asarray(l_ref), rtol=2e-4)
    _assert_trees_close(p_ref, p_k)


@pytest.mark.parametrize("activation,scaling", [
    ("tanh", "identity"), ("relu", "tanh"), ("elu", "identity")])
def test_activations(activation, scaling):
    G = 2
    times, values = _data(G * BS, seed=8)
    valid = jnp.ones((G * BS,), bool)
    model = _model(activation=activation, input_scaling=scaling)
    params = model.init(jax.random.PRNGKey(5))
    p_ref, l_ref = _reference_loop(model, params, times, values, valid, G,
                                   1e-3, 5e-4)
    p_k, l_k = _run_kernel(params, times, values, valid, G, 1e-3, 5e-4,
                           activation=activation, input_scaling=scaling)
    np.testing.assert_allclose(np.asarray(l_k), np.asarray(l_ref), rtol=2e-4)
    _assert_trees_close(p_ref, p_k)


def test_mean_only():
    G = 2
    times, values = _data(G * BS, seed=9)
    valid = jnp.ones((G * BS,), bool)
    model = _model(K=1)
    params = model.init(jax.random.PRNGKey(3))
    p_ref, l_ref = _reference_loop(model, params, times, values, valid, G,
                                   1e-3, 5e-4, K=1)
    p_k, l_k = _run_kernel(params, times, values, valid, G, 1e-3, 5e-4, K=1)
    np.testing.assert_allclose(np.asarray(l_k), np.asarray(l_ref), rtol=2e-4)
    _assert_trees_close(p_ref, p_k)


def test_traj_mask_padding_rows():
    G = 2
    times, values = _data(G * BS, seed=3)
    valid = jnp.ones((G * BS,), bool).at[-5:].set(False)
    model = _model()
    p0 = model.init(jax.random.PRNGKey(1))
    p_ref, l_ref = _reference_loop(model, p0, times, values, valid, G,
                                   1e-3, 0.0)
    p_k, l_k = _run_kernel(p0, times, values, valid, G, 1e-3, 0.0)
    np.testing.assert_allclose(np.asarray(l_k), np.asarray(l_ref), rtol=2e-4)
    _assert_trees_close(p_ref, p_k)


def test_resume_across_calls():
    G = 4
    times, values = _data(G * BS, seed=5)
    valid = jnp.ones((G * BS,), bool)
    p0 = _model().init(jax.random.PRNGKey(2))
    p_one, l_one = _run_kernel(p0, times, values, valid, G, 1e-3, 5e-4)
    p_two, l_two = _run_kernel(p0, times, values, valid, G, 1e-3, 5e-4,
                               split=2)
    np.testing.assert_allclose(np.asarray(l_two), np.asarray(l_one),
                               rtol=1e-6)
    _assert_trees_close(p_one, p_two, rtol=1e-6, atol=1e-8)


def test_checkpoint_interop():
    """XLA (params, optax state) -> kernel state -> back, mid-run: G XLA
    steps + G kernel steps == 2G XLA steps."""
    G, lr, wd = 2, 1e-3, 5e-4
    times, values = _data(2 * G * BS, seed=7)
    model = _model()
    params = model.init(jax.random.PRNGKey(4))
    tx = make_adam(lr, wd)
    opt = tx.init(params)

    def xla_step(params, opt, sl):
        t, v = times[sl], values[sl]

        def loss_fn(p):
            pr, pb = model.apply(p, t, v)
            return nj_ode_loss_dense(v, pr, pb, None,
                                     ignore_first_continuity=True,
                                     moment_weights=[1.0, 10.0])

        _, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, upd), opt

    p_ref, o_ref = params, opt
    for g in range(2 * G):
        p_ref, o_ref = xla_step(p_ref, o_ref, slice(g * BS, (g + 1) * BS))

    p_mid, o_mid = params, opt
    for g in range(G):
        p_mid, o_mid = xla_step(p_mid, o_mid, slice(g * BS, (g + 1) * BS))
    kst = walk_state_from(p_mid, o_mid, num_moments=2, hidden_dim=H)
    data = pack_minibatches(times[G * BS:], values[G * BS:],
                            jnp.ones((G * BS,), bool), BS)
    kst, _ = fused_walk_train_run(
        kst, data, n_slots=N, num_moments=2, batch_size=BS, hidden_dim=H,
        dt_ode_step=DT, max_substeps=M, lr=lr, weight_decay=wd,
        interpret=True)
    p_k, o_k = optax_state_into_walk(kst, G, o_mid, num_moments=2,
                                     hidden_dim=H)
    _assert_trees_close(p_ref, p_k)
    adam_ref = next(s for s in o_ref if isinstance(s, optax.ScaleByAdamState))
    adam_k = next(s for s in o_k if isinstance(s, optax.ScaleByAdamState))
    assert int(adam_k.count) == int(adam_ref.count) == 2 * G


def test_availability_and_shapes():
    assert walk_train_available(True, 1, 1, 1, "relu", 0.0, "identity", 0.01)
    assert not walk_train_available(False, 1, 1, 1, "relu", 0.0,
                                    "identity", 0.01)    # separate nets
    assert not walk_train_available(True, 1, 1, 1, "relu", 0.0,
                                    "identity", None)    # no substeps
    assert not walk_train_available(True, 2, 1, 1, "relu", 0.0,
                                    "identity", 0.01)    # d_x
    assert not walk_train_available(True, 1, 1, 2, "relu", 0.0,
                                    "identity", 0.01)    # layers
    assert walk_train_shapes_ok(50, 128, 10, 100)        # the production row
    # beyond the direct residual ring the kernel checkpoints + recomputes
    # (r5): fine-dt recipes stay eligible...
    assert walk_train_shapes_ok(50, 128, 10, 400)
    assert walk_train_shapes_ok(50, 128, 10, 1000)       # --dt-ode-step 0.001
    assert walk_train_shapes_ok(50, 256, 10, 100)        # batch 256 (chunked)
    # ...but even the chunked ring (~2 sqrt(M) rows) has a VMEM ceiling
    assert not walk_train_shapes_ok(50, 256, 10, 100_000)
    assert not walk_train_shapes_ok(50, 120, 10, 100)    # rows % 16
    assert not walk_train_shapes_ok(126, 128, 10, 100)   # hidden + 3 > 128
    assert not walk_train_shapes_ok(50, 128, 70, 100)    # slots > lanes
    with pytest.raises(ValueError, match="not eligible"):
        p = _model().init(jax.random.PRNGKey(0))
        st = init_walk_state(p, num_moments=2, hidden_dim=H)
        fused_walk_train_run(st, jnp.zeros((24, 128)), n_slots=N,
                             num_moments=2, batch_size=12, hidden_dim=H,
                             dt_ode_step=DT, max_substeps=M, interpret=True)


# ----------------------------------------------------------------------
# Trainer integration: the walk twin of --kernels train / auto
# ----------------------------------------------------------------------

def _loaders(n_train=2 * BS, n_val=8, cache=True):
    from njode_tpu.utils.training import create_data_loaders
    return create_data_loaders(
        process_type="black_scholes", n_train=n_train, n_val=n_val,
        obs_fraction=N / 20.0, n_steps=20, cache_data=cache, base_seed=0,
        obs_only=True, mu=0.1, sigma=0.5, x0=1.0)


def test_trainer_walk_kernel_mode_matches_xla(capsys):
    """Trainer(use_train_kernel='interpret') on a --dt-ode-step +
    grid_walk model routes through the WALK twin (ops/walk_train.py) and
    reproduces the XLA trainer's whole train() run: per-epoch train/val
    losses and final params, identical shuffle-key streams."""
    from njode_tpu.utils.training import Trainer

    lr, wd = 1e-3, 5e-4

    def run(kernel):
        model = _model()
        tr = Trainer(model, make_adam(lr, wd),
                     ignore_first_continuity=True,
                     moment_weights=[1.0, 10.0], seed=0,
                     use_train_kernel=("interpret" if kernel else False),
                     train_kernel_opts=dict(lr=lr, weight_decay=wd))
        train_fn, val_fn = _loaders()
        hist = tr.train(train_fn, val_fn, n_epochs=3, batch_size=BS,
                        print_every=1)
        return hist, tr.params

    h_x, p_x = run(False)
    h_k, p_k = run(True)
    out = capsys.readouterr().out
    assert "train=on (interpreter) (walk twin)" in out, out
    np.testing.assert_allclose(np.asarray(h_k["train_loss"]),
                               np.asarray(h_x["train_loss"]), rtol=2e-4)
    np.testing.assert_allclose(np.asarray(h_k["val_loss"]),
                               np.asarray(h_x["val_loss"]), rtol=2e-4)
    _assert_trees_close(p_x, p_k, rtol=2e-4, atol=2e-5)


def test_trainer_walk_check_rejects():
    """Ineligible --dt-ode-step configs fail --kernels train fast, with
    every problem listed (the walk-twin fail-fast check)."""
    from njode_tpu.utils.training import Trainer

    model = NeuralJumpODE(input_dim=1, hidden_dim=H, output_dim=1,
                          num_moments=2, shared_network=False,
                          dt_ode_step=DT, t_max=1.0)       # grid_walk off
    tr = Trainer(model, make_adam(1e-3), ignore_first_continuity=False,
                 use_train_kernel="interpret")
    train_fn, _ = _loaders()
    with pytest.raises(ValueError, match="walk twin") as ei:
        tr.train(train_fn, None, n_epochs=1, batch_size=12)
    msg = str(ei.value)
    assert "model config" in msg             # separate networks
    assert "grid_walk off" in msg
    assert "ignore_first_continuity" in msg
    assert "shapes" in msg                   # batch 12 not a multiple of 16
    assert "train_kernel_opts" in msg


def test_auto_walk_train_resolution(monkeypatch):
    """--kernels auto engages the walk-train kernel exactly in its
    measured win regime (real TPU + eligible production config +
    grid-walk promise) and quietly degrades to the composed
    XLA+walk-kernel path everywhere else."""
    from njode_tpu.utils import training as T
    from njode_tpu.utils.training import Trainer

    lr, wd = 1e-3, 5e-4

    def mk(model=None):
        model = model or _model()
        tr = Trainer(model, make_adam(lr, wd), ignore_first_continuity=True,
                     moment_weights=[1.0, 10.0], use_train_kernel="auto",
                     train_kernel_opts=dict(lr=lr, weight_decay=wd))
        loader, _ = _loaders()
        return tr, loader

    tr, loader = mk()
    # off-TPU (this CI runs on CPU): auto -> XLA, quietly
    assert tr._auto_walk_train_ok(BS, True, loader) is False

    monkeypatch.setattr(T.jax, "default_backend", lambda: "tpu")
    assert tr._auto_walk_train_ok(BS, True, loader) is True
    assert tr._auto_walk_train_ok(BS, False, loader) is False   # no chunks
    assert tr._auto_walk_train_ok(BS + 1, True, loader) is False  # rows % 16

    # no grid-walk promise -> quiet False
    m2 = NeuralJumpODE(input_dim=1, hidden_dim=H, output_dim=1,
                       num_moments=2, shared_network=True,
                       dt_ode_step=DT, t_max=1.0, grid_walk=False)
    tr2, loader2 = mk(model=m2)
    assert tr2._auto_walk_train_ok(BS, True, loader2) is False

    # fine-dt grids ride the checkpoint-recompute ring since r5: dt 0.0025
    # (400 cells) is eligible where the r4 direct ring overflowed...
    m3 = NeuralJumpODE(input_dim=1, hidden_dim=50, output_dim=1,
                       num_moments=2, shared_network=True,
                       dt_ode_step=0.0025, t_max=1.0, grid_walk=True)
    tr3, loader3 = mk(model=m3)
    assert tr3._auto_walk_train_ok(256, True, loader3) is True
    # ...but even the chunked ring has a VMEM ceiling -> quiet False
    m4 = NeuralJumpODE(input_dim=1, hidden_dim=50, output_dim=1,
                       num_moments=2, shared_network=True,
                       dt_ode_step=1e-5, t_max=1.0, grid_walk=True)
    tr4, loader4 = mk(model=m4)
    assert tr4._auto_walk_train_ok(256, True, loader4) is False


def test_trainer_walk_kernel_mxu_bfloat16():
    """train_kernel_opts['mxu_dtype'] plumbs through the Trainer to the
    kernel: bf16 matmul operands (f32 accumulation) train to within a few
    percent of the f32 run, and an unknown dtype fails the fail-fast
    check by name."""
    from njode_tpu.utils.training import Trainer

    lr, wd = 1e-3, 5e-4

    def run(mxu):
        model = _model()
        tr = Trainer(model, make_adam(lr, wd),
                     ignore_first_continuity=True,
                     moment_weights=[1.0, 10.0], seed=0,
                     use_train_kernel="interpret",
                     train_kernel_opts=dict(lr=lr, weight_decay=wd,
                                            mxu_dtype=mxu))
        train_fn, val_fn = _loaders()
        return tr.train(train_fn, val_fn, n_epochs=2, batch_size=BS,
                        print_every=1)

    h32 = run("float32")
    h16 = run("bfloat16")
    a = np.asarray(h16["train_loss"])
    b = np.asarray(h32["train_loss"])
    assert np.all(np.isfinite(a))
    assert not np.allclose(a, b, rtol=1e-7)     # bf16 rounding is real
    np.testing.assert_allclose(a, b, rtol=0.05)  # but small

    with pytest.raises(ValueError, match="mxu_dtype"):
        run("float16")

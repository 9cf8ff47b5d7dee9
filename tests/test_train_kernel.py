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


@pytest.mark.parametrize("activation", ["tanh", "elu", "leaky_relu", "selu"])
@pytest.mark.parametrize("scaling", ["identity", "tanh"])
def test_matches_optax_loop_activations(activation, scaling):
    """The in-kernel backward's activation/scaling gradient tables match
    autodiff for every zero-preserving pair the eligibility gate admits
    (relu is covered everywhere else)."""
    G, lr, wd = 2, 1e-3, 5e-4
    times, values = _data(G * BS, seed=11)
    valid = jnp.ones((G * BS,), bool)
    model = NeuralJumpODE(input_dim=1, hidden_dim=H, output_dim=1,
                          num_moments=2, activation=activation,
                          input_scaling=scaling)
    params = model.init(jax.random.PRNGKey(6))
    tx = make_adam(lr, wd)
    opt = tx.init(params)
    p_ref = params
    l_ref = []
    for g in range(G):
        sl = slice(g * BS, (g + 1) * BS)
        t, v = times[sl], values[sl]

        def loss_fn(p):
            pr, pb = model.apply(p, t, v)
            return nj_ode_loss_dense(v, pr, pb, None,
                                     ignore_first_continuity=True,
                                     moment_weights=[1.0, 10.0])

        l, grads = jax.value_and_grad(loss_fn)(p_ref)
        upd, opt = tx.update(grads, opt, p_ref)
        p_ref = optax.apply_updates(p_ref, upd)
        l_ref.append(float(l))

    data = pack_minibatches(times, values, valid, BS)
    st = init_train_state(params, num_moments=2, hidden_dim=H)
    st, l_k = fused_train_run(st, data, n_slots=N, num_moments=2,
                              batch_size=BS, lr=lr, weight_decay=wd,
                              activation=activation, input_scaling=scaling,
                              interpret=True)
    p_k = train_state_params(st, num_moments=2, hidden_dim=H)
    np.testing.assert_allclose(np.asarray(l_k), np.asarray(l_ref), rtol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p_ref),
                    jax.tree_util.tree_leaves(p_k)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=2e-6)


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


def test_trainer_checkpoint_interop():
    """An XLA-trainer (params, optax opt_state) converts into the kernel
    train state and back losslessly mid-run: G XLA steps -> convert ->
    G kernel steps == 2G XLA steps (incl. Adam count/bias correction)."""
    from njode_tpu.ops.train_kernel import kernel_state_from, optax_state_into

    G, lr, wd = 2, 1e-3, 5e-4
    times, values = _data(2 * G * BS, seed=7)
    model = NeuralJumpODE(input_dim=1, hidden_dim=H, output_dim=1,
                          num_moments=2)
    params = model.init(jax.random.PRNGKey(4))
    tx = make_adam(lr, wd)
    opt = tx.init(params)

    def xla_step(params, opt, sl):
        t, v = times[sl], values[sl]

        def loss_fn(p):
            pr, pb = model.apply(p, t, v)
            return nj_ode_loss_dense(v, pr, pb, None,
                                     ignore_first_continuity=True,
                                     moment_weights=[1.0, 10.0],
                                     variance_method="direct")

        _, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, upd), opt

    # arm 1: 2G pure-XLA steps
    p_ref, o_ref = params, opt
    for g in range(2 * G):
        p_ref, o_ref = xla_step(p_ref, o_ref, slice(g * BS, (g + 1) * BS))

    # arm 2: G XLA steps, convert, G kernel steps, convert back
    p_mid, o_mid = params, opt
    for g in range(G):
        p_mid, o_mid = xla_step(p_mid, o_mid, slice(g * BS, (g + 1) * BS))
    kst = kernel_state_from(p_mid, o_mid, num_moments=2, hidden_dim=H)
    data = pack_minibatches(times[G * BS:], values[G * BS:],
                            jnp.ones((G * BS,), bool), BS)
    kst, _ = fused_train_run(kst, data, n_slots=N, num_moments=2,
                             batch_size=BS, lr=lr, weight_decay=wd,
                             interpret=True)
    p_k, o_k = optax_state_into(kst, G, o_mid, num_moments=2, hidden_dim=H)

    for a, b in zip(jax.tree_util.tree_leaves(p_ref),
                    jax.tree_util.tree_leaves(p_k)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=2e-6)
    import optax as _optax
    adam_ref = next(s for s in o_ref
                    if isinstance(s, _optax.ScaleByAdamState))
    adam_k = next(s for s in o_k
                  if isinstance(s, _optax.ScaleByAdamState))
    assert int(adam_k.count) == int(adam_ref.count) == 2 * G
    for a, b in zip(jax.tree_util.tree_leaves(adam_ref.mu),
                    jax.tree_util.tree_leaves(adam_k.mu)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-3, atol=1e-7)


@pytest.mark.parametrize("activation", ["relu", "identity"])
def test_trainer_kernel_mode_matches_xla(activation):
    """Trainer(use_train_kernel='interpret') reproduces the default XLA
    trainer's whole train() run: per-epoch train/val losses and final
    params, with identical shuffle-key streams.  'identity' exercises the
    reference's silent ReLU fallback (the OU CLI default): both paths
    must resolve it the same way (models/activations.py
    canonical_activation)."""
    from njode_tpu.utils.training import Trainer, create_data_loaders

    lr, wd = 1e-3, 5e-4

    def run(kernel):
        model = NeuralJumpODE(input_dim=1, hidden_dim=H, output_dim=1,
                              num_moments=2, activation=activation)
        tr = Trainer(model, make_adam(lr, wd),
                     ignore_first_continuity=True,
                     moment_weights=[1.0, 10.0], seed=0,
                     use_train_kernel=("interpret" if kernel else False),
                     train_kernel_opts=dict(lr=lr, weight_decay=wd))
        train_fn, val_fn = create_data_loaders(
            process_type="black_scholes", n_train=2 * BS, n_val=8,
            obs_fraction=N / 100.0, cache_data=True, base_seed=0,
            obs_only=True, mu=0.1, sigma=0.5, x0=1.0)
        hist = tr.train(train_fn, val_fn, n_epochs=3, batch_size=BS,
                        print_every=1)
        return hist, tr.params

    h_x, p_x = run(False)
    h_k, p_k = run(True)
    np.testing.assert_allclose(np.asarray(h_k["train_loss"]),
                               np.asarray(h_x["train_loss"]), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(h_k["val_loss"]),
                               np.asarray(h_x["val_loss"]), rtol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p_x),
                    jax.tree_util.tree_leaves(p_k)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=2e-6)


def test_trainer_kernel_check_rejects():
    """Ineligible configs fail fast with every problem listed."""
    from njode_tpu.utils.training import Trainer, create_data_loaders

    model = NeuralJumpODE(input_dim=1, hidden_dim=H, output_dim=1,
                          num_moments=2, dropout_rate=0.3)
    tr = Trainer(model, make_adam(1e-3), ignore_first_continuity=False,
                 use_train_kernel="interpret")
    train_fn, _ = create_data_loaders(
        process_type="black_scholes", n_train=BS, n_val=4,
        obs_fraction=N / 100.0, cache_data=True, obs_only=True,
        mu=0.1, sigma=0.5, x0=1.0)
    with pytest.raises(ValueError) as ei:
        tr.train(train_fn, None, n_epochs=1, batch_size=12)
    msg = str(ei.value)
    assert "model config" in msg            # dropout
    assert "ignore_first_continuity" in msg
    assert "multiple of 8" in msg           # batch_size 12
    assert "train_kernel_opts" in msg


def test_vmap_kernel_members_independent():
    """jax.vmap over fused_train_run keeps members independent and exact:
    Pallas's batching rule prepends a batch grid axis and remaps
    program_id, so the VMEM scratch-carry (params/Adam state across the
    step grid) stays per-member.  (Measured SLOWER than the XLA vmapped
    ensemble on TPU — BENCH_NOTES r3c — so ensembles don't use it; this
    pins that the primitive composes correctly regardless.)"""
    G, Emembers = 2, 3
    states, datas = [], []
    for e in range(Emembers):
        p = NeuralJumpODE(input_dim=1, hidden_dim=H, output_dim=1,
                          num_moments=2).init(jax.random.PRNGKey(e))
        states.append(init_train_state(p, num_moments=2, hidden_dim=H))
        t, v = _data(G * BS, seed=40 + e)
        datas.append(pack_minibatches(t, v, jnp.ones((G * BS,), bool), BS))
    stack = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)
    dstack = jnp.stack(datas)
    kw = dict(n_slots=N, num_moments=2, batch_size=BS, lr=1e-3,
              weight_decay=5e-4, interpret=True)

    ref = [fused_train_run(st, d, **kw) for st, d in zip(states, datas)]
    vst, vloss = jax.vmap(lambda st, d: fused_train_run(st, d, **kw))(
        stack, dstack)

    for e in range(Emembers):
        st_r, l_r = ref[e]
        np.testing.assert_allclose(np.asarray(vloss[e]), np.asarray(l_r),
                                   rtol=1e-6)
        p_r = train_state_params(st_r, num_moments=2, hidden_dim=H)
        p_v = train_state_params(
            jax.tree_util.tree_map(lambda x: x[e], vst),
            num_moments=2, hidden_dim=H)
        for a, b in zip(jax.tree_util.tree_leaves(p_r),
                        jax.tree_util.tree_leaves(p_v)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-6, atol=1e-8)


def test_canonical_activation_keys():
    """Kernel eligibility consumes the RESOLVED activation/scaling names:
    'identity' (unknown -> ReLU fallback, the OU CLI default) and 'none'
    (identity-scaling alias) must not disqualify a kernel-shaped model."""
    from njode_tpu.models.activations import (canonical_activation,
                                              canonical_input_scaling)
    assert canonical_activation("identity") == "relu"
    assert canonical_activation("ReLU") == "relu"
    assert canonical_activation("tanh") == "tanh"
    assert canonical_input_scaling("none") == "identity"
    m = NeuralJumpODE(input_dim=1, hidden_dim=H, output_dim=1,
                      num_moments=2, activation="identity",
                      input_scaling="identity")
    assert m._act_key == "relu" and m._step_eligible
    assert train_kernel_available(False, 1, 1, 1, m._act_key, 0.0,
                                  m._scale_key, None)


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


def test_fused_train_run_rejects_bad_batch_size():
    """The VMEM row-tile constraints are enforced by the kernel API itself,
    not just by the Trainer/bench callers."""
    from njode_tpu.ops.train_kernel import MAX_BATCH_ROWS, batch_size_ok

    assert batch_size_ok(8) and batch_size_ok(MAX_BATCH_ROWS)
    for bad in (None, 0, -8, 12, MAX_BATCH_ROWS + 8):
        assert not batch_size_ok(bad)

    model = NeuralJumpODE(input_dim=1, hidden_dim=H, output_dim=1,
                          num_moments=2)
    st = init_train_state(model.init(jax.random.PRNGKey(0)),
                          num_moments=2, hidden_dim=H)
    times, values = _data(24)
    data = pack_minibatches(times, values, jnp.ones(24, bool), 12)
    with pytest.raises(ValueError, match="multiple of 8"):
        fused_train_run(st, data, n_slots=N, num_moments=2, batch_size=12,
                        lr=1e-3, interpret=True)


@pytest.mark.parametrize("variance_method", ["direct", "second_moment"])
def test_dual_pack_matches_classic(monkeypatch, variance_method):
    """The block-diagonal dual-pack layout (hidden <= BLOCK, K = 2: both
    networks in ONE weight set, see train_kernel.BLOCK) must reproduce the
    classic per-network kernel step-for-step, and its weight planes must
    stay EXACTLY block-diagonal (off-diagonal gradient mass is masked
    before Adam — any leak would couple the two moment networks)."""
    from njode_tpu.ops import train_kernel as tk

    G, lr, wd = 3, 1e-3, 5e-4
    times, values = _data(G * BS, seed=3)
    valid = jnp.ones((G * BS,), bool).at[-3:].set(False)
    model = NeuralJumpODE(input_dim=1, hidden_dim=H, output_dim=1,
                          num_moments=2)
    params = model.init(jax.random.PRNGKey(9))
    data = pack_minibatches(times, values, valid, BS)
    kw = dict(n_slots=N, num_moments=2, batch_size=BS, lr=lr,
              weight_decay=wd, interpret=True,
              variance_method=variance_method)

    monkeypatch.setenv("NJODE_TRAIN_KERNEL_DUAL", "0")
    st_c = init_train_state(params, num_moments=2, hidden_dim=H)
    assert st_c[0].ndim == 4                             # classic layout
    st_c, l_c = fused_train_run(st_c, data, **kw)
    p_c = train_state_params(st_c, num_moments=2, hidden_dim=H)

    monkeypatch.setenv("NJODE_TRAIN_KERNEL_DUAL", "1")
    st_d = init_train_state(params, num_moments=2, hidden_dim=H)
    assert st_d[0].ndim == 3                             # dual layout
    st_d, l_d = fused_train_run(st_d, data, **kw)
    p_d = train_state_params(st_d, num_moments=2, hidden_dim=H)

    np.testing.assert_allclose(np.asarray(l_d), np.asarray(l_c), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p_c),
                    jax.tree_util.tree_leaves(p_d)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-8)
    for t in st_d[:6]:                                   # W,V + Adam moments
        if t.ndim == 3:                                  # matrix planes
            W = np.asarray(t)
            assert (W[:, :tk.BLOCK, tk.BLOCK:] == 0).all()
            assert (W[:, tk.BLOCK:, :tk.BLOCK] == 0).all()


def test_dual_pack_eligibility():
    from njode_tpu.ops.train_kernel import BLOCK, _dual_pack_eligible
    assert _dual_pack_eligible(2, BLOCK)
    assert _dual_pack_eligible(2, 32)
    assert not _dual_pack_eligible(2, BLOCK + 1)         # needs two blocks
    assert not _dual_pack_eligible(3, 32)                # K = 2 only


def test_mxu_bf16_close_to_f32():
    """mxu_dtype='bfloat16' rounds matmul inputs only (f32 accumulation,
    f32 Adam state) — losses and params must track the f32 kernel to bf16
    input precision.  Measured perf-neutral at one-tile widths
    (BENCH_NOTES.md 'bf16 MXU inputs'); ships as API surface only."""
    times, values = _data(2 * BS, seed=11)
    valid = jnp.ones((2 * BS,), bool)
    model = NeuralJumpODE(input_dim=1, hidden_dim=H, output_dim=1,
                          num_moments=2)
    params = model.init(jax.random.PRNGKey(12))
    data = pack_minibatches(times, values, valid, BS)
    kw = dict(n_slots=N, num_moments=2, batch_size=BS, lr=1e-3,
              weight_decay=5e-4, interpret=True)
    out = {}
    for mxu in ("float32", "bfloat16"):
        st = init_train_state(params, num_moments=2, hidden_dim=H)
        st, losses = fused_train_run(st, data, mxu_dtype=mxu, **kw)
        out[mxu] = (np.asarray(losses), st)
    lf, stf = out["float32"]
    lb, stb = out["bfloat16"]
    np.testing.assert_allclose(lb, lf, rtol=5e-3)
    for a, b in zip(stf[:2], stb[:2]):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=0.1, atol=1e-3)
    with pytest.raises(ValueError, match="mxu_dtype"):
        fused_train_run(init_train_state(params, num_moments=2,
                                         hidden_dim=H),
                        data, mxu_dtype="float16", **kw)


def test_trainer_kernel_check_rejects_hparam_mismatch():
    """A make_adam chain carries its lr/weight_decay; train_kernel_opts
    that disagree must fail fast (the kernel would otherwise train with
    different hyperparameters than the optax state it round-trips
    through, and a later XLA-path resume would silently switch them)."""
    from njode_tpu.utils.training import Trainer, create_data_loaders

    model = NeuralJumpODE(input_dim=1, hidden_dim=H, output_dim=1,
                          num_moments=2)
    tr = Trainer(model, make_adam(1e-2, 0.0), ignore_first_continuity=True,
                 use_train_kernel="interpret",
                 train_kernel_opts=dict(lr=1e-3, weight_decay=5e-4))
    train_fn, _ = create_data_loaders(
        process_type="black_scholes", n_train=BS, n_val=4,
        obs_fraction=N / 100.0, cache_data=True, obs_only=True,
        mu=0.1, sigma=0.5, x0=1.0)
    with pytest.raises(ValueError) as ei:
        tr.train(train_fn, None, n_epochs=1, batch_size=BS)
    msg = str(ei.value)
    assert "optimizer's lr" in msg
    assert "optimizer's weight_decay" in msg


def _auto_trainer(**overrides):
    """An eligible (hidden<=128, separate nets, euler, f32) Trainer +
    loader pair for the --kernels auto resolution tests."""
    from njode_tpu.utils.training import Trainer, create_data_loaders

    lr, wd = 1e-3, 5e-4
    model_kw = dict(input_dim=1, hidden_dim=H, output_dim=1, num_moments=2)
    model_kw.update(overrides.pop("model", {}))
    model = NeuralJumpODE(**model_kw)
    tr_kw = dict(ignore_first_continuity=True, use_train_kernel="auto",
                 train_kernel_opts=dict(lr=lr, weight_decay=wd))
    tr_kw.update(overrides)
    tr = Trainer(model, make_adam(lr, wd), **tr_kw)
    train_fn, _ = create_data_loaders(
        process_type="black_scholes", n_train=2 * BS, n_val=4,
        obs_fraction=N / 100.0, cache_data=False, obs_only=True,
        mu=0.1, sigma=0.5, x0=1.0)
    return tr, train_fn


def test_auto_train_kernel_resolution(monkeypatch):
    """--kernels auto engages the whole-run kernel exactly in its measured
    win regime: real TPU + eligible config + slots that fit the lanes —
    and silently resolves to the XLA path everywhere else (auto never
    runs the interpreter)."""
    from njode_tpu.utils import training as T

    tr, loader = _auto_trainer()
    # off-TPU (this CI runs on CPU): auto -> XLA, quietly
    assert tr._auto_train_kernel_ok(BS, True, loader) is False

    # fake a TPU backend: the same config must now engage
    monkeypatch.setattr(T.jax, "default_backend", lambda: "tpu")
    assert tr._auto_train_kernel_ok(BS, True, loader) is True
    # ... but not without the fused chunk path
    assert tr._auto_train_kernel_ok(BS, False, loader) is False
    # ... or with a kernel-incompatible batch size (not a multiple of 8)
    assert tr._auto_train_kernel_ok(BS - 4 + 1, True, loader) is False

    # ineligible model (dropout) -> quiet False, no raise
    tr2, loader2 = _auto_trainer(model=dict(dropout_rate=0.3))
    assert tr2._auto_train_kernel_ok(BS, True, loader2) is False

    # too many observation slots for the lane packing (2N+1 > 128)
    from njode_tpu.utils.training import create_data_loaders
    big_train, _ = create_data_loaders(
        process_type="black_scholes", n_train=2 * BS, n_val=4,
        obs_fraction=0.9, n_steps=200, cache_data=False, obs_only=True,
        mu=0.1, sigma=0.5, x0=1.0)
    assert tr._auto_train_kernel_ok(BS, True, big_train) is False


def test_auto_train_kernel_off_tpu_trains_on_xla():
    """A full train() with use_train_kernel='auto' on CPU runs the normal
    XLA chunked path (identical history to use_train_kernel=False)."""
    from njode_tpu.utils.training import Trainer, create_data_loaders

    lr, wd = 1e-3, 5e-4

    def run(mode):
        model = NeuralJumpODE(input_dim=1, hidden_dim=H, output_dim=1,
                              num_moments=2)
        tr = Trainer(model, make_adam(lr, wd), ignore_first_continuity=True,
                     seed=0, use_train_kernel=mode,
                     train_kernel_opts=dict(lr=lr, weight_decay=wd))
        train_fn, val_fn = create_data_loaders(
            process_type="black_scholes", n_train=2 * BS, n_val=8,
            obs_fraction=N / 100.0, cache_data=True, base_seed=0,
            obs_only=True, mu=0.1, sigma=0.5, x0=1.0)
        return tr.train(train_fn, val_fn, n_epochs=2, batch_size=BS,
                        print_every=1)

    h_auto = run("auto")
    h_off = run(False)
    np.testing.assert_array_equal(np.asarray(h_auto["train_loss"]),
                                  np.asarray(h_off["train_loss"]))
    np.testing.assert_array_equal(np.asarray(h_auto["val_loss"]),
                                  np.asarray(h_off["val_loss"]))


def test_run_experiment_auto_wires_train_kernel(tmp_path, monkeypatch):
    """--kernels auto reaches the Trainer as use_train_kernel='auto' (the
    Trainer resolves eligibility at train() time) while the model keeps
    use_pallas='auto' for its inference-side gap-kernel policy."""
    from njode_tpu.utils import training as T

    seen = {}
    orig = T.Trainer.__init__

    def spy(self, *a, **kw):
        seen["use_train_kernel"] = kw.get("use_train_kernel")
        return orig(self, *a, **kw)

    monkeypatch.setattr(T.Trainer, "__init__", spy)
    config = dict(
        experiment_name="auto_kernel", input_dim=1, hidden_dim=8,
        output_dim=1, n_hidden_layers=1, activation="relu",
        learning_rate=1e-2, weight_decay=5e-4, n_epochs=2, batch_size=16,
        shuffle=True, print_every=1, ignore_first_continuity=True,
        num_moments=2, use_pallas="auto", seed=0, data_seed=0,
        data=dict(process_type="black_scholes", n_train=16, n_val=8,
                  obs_fraction=0.2, cache_data=True, obs_only=True,
                  mu=0.1, sigma=0.5, T=1.0, n_steps=20, x0=1.0),
    )
    res = T.run_experiment(config, save_dir=str(tmp_path))
    assert seen["use_train_kernel"] == "auto"
    assert np.all(np.isfinite(np.asarray(res["history"]["train_loss"])))


@pytest.mark.parametrize("variance_method", ["direct", "second_moment"])
def test_trainer_kernel_mean_only_matches_xla(variance_method):
    """K=1 (mean-only, --num-moments 1): the kernel's closed-form loss
    drops the variance term exactly like nj_ode_loss_dense with one
    moment; whole train() histories and params match the XLA path.
    variance_method is a no-op at K=1 — both values must give the same
    kernel program."""
    from njode_tpu.utils.training import Trainer, create_data_loaders

    lr, wd = 1e-3, 5e-4

    def run(kernel):
        model = NeuralJumpODE(input_dim=1, hidden_dim=H, output_dim=1,
                              num_moments=1)
        tr = Trainer(model, make_adam(lr, wd),
                     ignore_first_continuity=True,
                     moment_weights=[1.0], seed=0,
                     variance_method=variance_method,
                     use_train_kernel=("interpret" if kernel else False),
                     train_kernel_opts=dict(lr=lr, weight_decay=wd))
        train_fn, val_fn = create_data_loaders(
            process_type="black_scholes", n_train=2 * BS, n_val=8,
            obs_fraction=N / 100.0, cache_data=True, base_seed=0,
            obs_only=True, mu=0.1, sigma=0.5, x0=1.0)
        hist = tr.train(train_fn, val_fn, n_epochs=3, batch_size=BS,
                        print_every=1)
        return hist, tr.params

    h_x, p_x = run(False)
    h_k, p_k = run(True)
    np.testing.assert_allclose(np.asarray(h_k["train_loss"]),
                               np.asarray(h_x["train_loss"]), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(h_k["val_loss"]),
                               np.asarray(h_x["val_loss"]), rtol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p_x),
                    jax.tree_util.tree_leaves(p_k)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=2e-6)


def test_auto_mode_not_consumed_by_train():
    """'auto' stays 'auto' across train() calls (the resolution is
    per-call): before the r3e fix the first train() overwrote the
    attribute with the resolved boolean, so a later call with
    kernel-ineligible arguments would hard-error from _train_kernel_check
    instead of quietly running XLA."""
    from njode_tpu.utils.training import Trainer, create_data_loaders

    lr, wd = 1e-3, 5e-4
    model = NeuralJumpODE(input_dim=1, hidden_dim=H, output_dim=1,
                          num_moments=2)
    tr = Trainer(model, make_adam(lr, wd), ignore_first_continuity=True,
                 use_train_kernel="auto",
                 train_kernel_opts=dict(lr=lr, weight_decay=wd))
    train_fn, val_fn = create_data_loaders(
        process_type="black_scholes", n_train=2 * BS, n_val=8,
        obs_fraction=N / 100.0, cache_data=True, base_seed=0,
        obs_only=True, mu=0.1, sigma=0.5, x0=1.0)
    tr.train(train_fn, val_fn, n_epochs=1, batch_size=BS, print_every=1)
    assert tr.use_train_kernel == "auto"
    # second call with a kernel-incompatible batch size: auto's contract
    # is a quiet XLA run, never a _train_kernel_check error
    tr.train(train_fn, val_fn, n_epochs=2, batch_size=BS - 3, print_every=1)
    assert tr.use_train_kernel == "auto"


def test_trainer_kernel_custom_betas_match_xla():
    """train_kernel_opts' optional betas/adam_eps reach the kernel: a
    non-default Adam (b1=0.8, b2=0.95, eps=1e-6) trains identically
    through use_train_kernel='interpret' and the XLA optax path."""
    from njode_tpu.utils.training import Trainer, create_data_loaders

    lr, wd, betas, eps = 1e-3, 5e-4, (0.8, 0.95), 1e-6

    def run(kernel):
        model = NeuralJumpODE(input_dim=1, hidden_dim=H, output_dim=1,
                              num_moments=2)
        tx = optax.chain(optax.add_decayed_weights(wd),
                         optax.scale_by_adam(b1=betas[0], b2=betas[1],
                                             eps=eps),
                         optax.scale(-lr))
        tr = Trainer(model, tx, ignore_first_continuity=True,
                     moment_weights=[1.0, 10.0], seed=0,
                     use_train_kernel=("interpret" if kernel else False),
                     train_kernel_opts=dict(lr=lr, weight_decay=wd,
                                            betas=betas, adam_eps=eps))
        train_fn, val_fn = create_data_loaders(
            process_type="black_scholes", n_train=2 * BS, n_val=8,
            obs_fraction=N / 100.0, cache_data=True, base_seed=0,
            obs_only=True, mu=0.1, sigma=0.5, x0=1.0)
        hist = tr.train(train_fn, val_fn, n_epochs=3, batch_size=BS,
                        print_every=1)
        return hist, tr.params

    h_x, p_x = run(False)
    h_k, p_k = run(True)
    np.testing.assert_allclose(np.asarray(h_k["train_loss"]),
                               np.asarray(h_x["train_loss"]), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(h_k["val_loss"]),
                               np.asarray(h_x["val_loss"]), rtol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p_x),
                    jax.tree_util.tree_leaves(p_k)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=2e-6)

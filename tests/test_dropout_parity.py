"""Train-mode dropout behavior.

Two gaps from VERDICT r1 missing-item 3: (a) a statistical parity test of
train-mode dropout against the torch reference (same weights, same
dropout_rate — output distribution over many rng draws must agree: the
reference places Dropout at different positions inside each of the three
MLPs, reference models/jump_ode.py:19-21,37-38,72-73, and a placement error
shifts the output mean through the nonlinearities); and (b) an end-to-end
dropout>0 training run behaving sanely.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from njode_tpu import NeuralJumpODE
from njode_tpu.models import pad_ragged
from njode_tpu.utils.torch_compat import params_from_torch_state_dict

from test_parity_torch import make_ragged_batch

N_DRAWS = 400
RATE = 0.5


def _build_dropout_pair(torch_reference, shared):
    import torch
    torch.manual_seed(11)
    kw = dict(input_dim=1, hidden_dim=16, output_dim=1, num_moments=2,
              n_hidden_layers=2, activation="relu", shared_network=shared,
              dropout_rate=RATE, input_scaling="identity")
    ref_model = torch_reference.models.jump_ode.NeuralJumpODE(**kw)
    model = NeuralJumpODE(**kw, t_max=1.0)
    params = params_from_torch_state_dict(ref_model.state_dict(), 2, shared)
    return ref_model, model, params


@pytest.mark.parametrize("shared", [False, True], ids=["separate", "shared"])
def test_dropout_train_mode_distribution(torch_reference, shared):
    """Same weights, dropout=0.5, train mode: the per-slot output mean and
    std over many independent dropout draws agree between frameworks."""
    import torch
    ref_model, model, params = _build_dropout_pair(torch_reference, shared)
    batch_times, batch_values = make_ragged_batch(seed=3, B=2)
    times, values, mask = pad_ragged(batch_times, batch_values)

    ref_model.train()
    torch.manual_seed(123)
    t_times = [torch.tensor(t) for t in batch_times]
    t_values = [torch.tensor(v) for v in batch_values]
    ref_draws = []
    with torch.no_grad():
        for _ in range(N_DRAWS):
            preds, _ = ref_model(t_times, t_values)
            ref_draws.append(np.stack(_pad_list(preds, times.shape[1])))
    ref_draws = np.stack(ref_draws)  # (N, B, Nmax, d, K)

    apply_fn = jax.jit(lambda p, k: model.apply(
        p, times, values, mask, rng=k, training=True)[0])
    keys = jax.random.split(jax.random.PRNGKey(0), N_DRAWS)
    ours_draws = np.stack([np.asarray(apply_fn(params, k)) for k in keys])

    m = np.asarray(mask)[None, :, :, None, None]
    ref_mean = (ref_draws * m).mean(axis=0)
    our_mean = (ours_draws * m).mean(axis=0)
    ref_std = (ref_draws * m).std(axis=0)
    our_std = (ours_draws * m).std(axis=0)

    # Monte-Carlo error of the mean is std/sqrt(N); allow 5 sigma + epsilon
    tol = 5.0 * np.maximum(ref_std, our_std) / np.sqrt(N_DRAWS) + 1e-3
    assert np.all(np.abs(ref_mean - our_mean) <= tol), (
        f"max mean gap {np.abs(ref_mean - our_mean).max():.4f} "
        f"vs tol {tol.max():.4f}")
    # dispersion agreement: std of std-estimate ~ std/sqrt(2(N-1))
    std_tol = 6.0 * np.maximum(ref_std, our_std) / np.sqrt(2 * N_DRAWS) + 1e-3
    assert np.all(np.abs(ref_std - our_std) <= std_tol), (
        f"max std gap {np.abs(ref_std - our_std).max():.4f}")
    # sanity: dropout is actually doing something (draws differ)
    assert ref_std.max() > 1e-3 and our_std.max() > 1e-3


def _pad_list(preds, n_max):
    out = []
    for p in preds:
        a = p.numpy() if hasattr(p, "numpy") else np.asarray(p)
        pad = np.zeros((n_max - a.shape[0],) + a.shape[1:], a.dtype)
        out.append(np.concatenate([a, pad], axis=0))
    return out


def test_dropout_zero_rate_is_noop(torch_reference):
    """rng plumbed but rate=0: training=True output equals eval output."""
    import torch
    torch.manual_seed(5)
    kw = dict(input_dim=1, hidden_dim=8, output_dim=1, num_moments=2,
              n_hidden_layers=1, dropout_rate=0.0)
    ref_model = torch_reference.models.jump_ode.NeuralJumpODE(**kw)
    model = NeuralJumpODE(**kw, t_max=1.0)
    params = params_from_torch_state_dict(ref_model.state_dict(), 2, False)
    batch_times, batch_values = make_ragged_batch(seed=4, B=2)
    times, values, mask = pad_ragged(batch_times, batch_values)
    a, _ = model.apply(params, times, values, mask)
    b, _ = model.apply(params, times, values, mask,
                       rng=jax.random.PRNGKey(1), training=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=0)


def test_dropout_training_run_converges():
    """End-to-end training with dropout_rate>0: finite, decreasing loss."""
    from njode_tpu.utils import Trainer, create_data_loaders, make_adam

    model = NeuralJumpODE(input_dim=1, hidden_dim=32, output_dim=1,
                          num_moments=2, dropout_rate=0.3, t_max=1.0)
    trainer = Trainer(model, make_adam(1e-3, 5e-4),
                      ignore_first_continuity=True,
                      moment_weights=[1.0, 10.0])
    train_fn, val_fn = create_data_loaders(
        process_type="black_scholes", n_train=64, n_val=32,
        obs_fraction=0.1, cache_data=True, T=1.0, n_steps=30,
        mu=0.1, sigma=0.5, x0=1.0)
    hist = trainer.train(train_fn, val_fn, n_epochs=25, print_every=25,
                         config={"data": {"process_type": "black_scholes",
                                          "mu": 0.1, "sigma": 0.5, "x0": 1.0,
                                          "T": 1.0, "n_steps": 30}})
    tr = np.asarray(hist["train_loss"])
    assert np.all(np.isfinite(tr))
    assert tr[-1] < tr[0], f"loss did not decrease: {tr[0]} -> {tr[-1]}"
    assert np.all(np.isfinite(np.asarray(hist["val_loss"])))

"""Numeric parity against the PyTorch reference implementation.

The single highest-risk item in the rebuild (SURVEY.md §7 'Hard parts' #1):
the before/after-jump bookkeeping, detach semantics, eps placement and
masked-mean denominators must survive the ragged-list -> masked-scan
transformation.  These tests run the reference model and ours on IDENTICAL
weights and inputs and demand agreement to ~1e-5.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from njode_tpu import NeuralJumpODE, nj_ode_loss
from njode_tpu.utils.torch_compat import params_from_torch_state_dict
from njode_tpu.simulation import get_conditional_moments_at_obs


def make_ragged_batch(seed=0, B=3, d_x=1):
    """Irregular observation batch with differing per-trajectory lengths."""
    rng = np.random.default_rng(seed)
    batch_times, batch_values = [], []
    for b in range(B):
        n = int(rng.integers(3, 8))
        t = np.sort(rng.uniform(0.0, 1.0, size=n)).astype(np.float32)
        t[0] = 0.0
        v = rng.normal(1.0, 0.3, size=(n, d_x)).astype(np.float32)
        batch_times.append(t)
        batch_values.append(v)
    return batch_times, batch_values


CONFIGS = [
    dict(num_moments=1, shared_network=False, dt_ode_step=None,
         activation="relu", n_hidden_layers=1, input_scaling="identity"),
    dict(num_moments=2, shared_network=False, dt_ode_step=None,
         activation="tanh", n_hidden_layers=2, input_scaling="tanh"),
    dict(num_moments=2, shared_network=True, dt_ode_step=None,
         activation="relu", n_hidden_layers=1, input_scaling="identity"),
    dict(num_moments=2, shared_network=False, dt_ode_step=0.033,
         activation="relu", n_hidden_layers=1, input_scaling="identity"),
    dict(num_moments=2, shared_network=True, dt_ode_step=0.01,
         activation="elu", n_hidden_layers=1, input_scaling="sigmoid"),
]


def build_pair(torch_reference, cfg, hidden_dim=16, d_x=1):
    import torch
    torch.manual_seed(7)
    ref_model = torch_reference.models.jump_ode.NeuralJumpODE(
        input_dim=d_x, hidden_dim=hidden_dim, output_dim=d_x,
        dt_ode_step=cfg["dt_ode_step"], num_moments=cfg["num_moments"],
        n_hidden_layers=cfg["n_hidden_layers"], activation=cfg["activation"],
        shared_network=cfg["shared_network"], dropout_rate=0.0,
        input_scaling=cfg["input_scaling"],
    )
    ref_model.eval()
    model = NeuralJumpODE(
        input_dim=d_x, hidden_dim=hidden_dim, output_dim=d_x,
        dt_ode_step=cfg["dt_ode_step"], num_moments=cfg["num_moments"],
        n_hidden_layers=cfg["n_hidden_layers"], activation=cfg["activation"],
        shared_network=cfg["shared_network"], dropout_rate=0.0,
        input_scaling=cfg["input_scaling"], t_max=1.0,
    )
    params = params_from_torch_state_dict(
        ref_model.state_dict(), cfg["num_moments"], cfg["shared_network"])
    return ref_model, model, params


@pytest.mark.parametrize("cfg", CONFIGS, ids=lambda c: (
    f"K{c['num_moments']}_{'sh' if c['shared_network'] else 'sep'}"
    f"_dt{c['dt_ode_step']}_{c['activation']}_L{c['n_hidden_layers']}"))
def test_forward_parity(torch_reference, cfg):
    import torch
    ref_model, model, params = build_pair(torch_reference, cfg)
    batch_times, batch_values = make_ragged_batch()

    with torch.no_grad():
        ref_preds, ref_preds_before = ref_model(
            [torch.tensor(t) for t in batch_times],
            [torch.tensor(v) for v in batch_values])

    preds, preds_before = model.forward(params, batch_times, batch_values)

    for b in range(len(batch_times)):
        np.testing.assert_allclose(
            np.asarray(preds[b]), ref_preds[b].numpy(), rtol=2e-4, atol=2e-5,
            err_msg=f"after-jump mismatch, trajectory {b}")
        np.testing.assert_allclose(
            np.asarray(preds_before[b]), ref_preds_before[b].numpy(),
            rtol=2e-4, atol=2e-5,
            err_msg=f"before-jump mismatch, trajectory {b}")


@pytest.mark.parametrize("variance_method", ["direct", "second_moment"])
@pytest.mark.parametrize("ignore_first", [False, True])
def test_loss_parity(torch_reference, variance_method, ignore_first):
    import torch
    cfg = dict(num_moments=2, shared_network=False, dt_ode_step=None,
               activation="relu", n_hidden_layers=1, input_scaling="identity")
    ref_model, model, params = build_pair(torch_reference, cfg)
    batch_times, batch_values = make_ragged_batch(seed=3)
    weights = [1.0, 10.0]

    with torch.no_grad():
        rp, rpb = ref_model([torch.tensor(t) for t in batch_times],
                            [torch.tensor(v) for v in batch_values])
        ref_loss = torch_reference.models.jump_ode.nj_ode_loss(
            [torch.tensor(t) for t in batch_times],
            [torch.tensor(v) for v in batch_values], rp, rpb,
            ignore_first_continuity=ignore_first,
            moment_weights=torch.tensor(weights),
            variance_method=variance_method).item()

    preds, preds_before = model.forward(params, batch_times, batch_values)
    loss = nj_ode_loss(batch_times, batch_values, preds, preds_before,
                       ignore_first_continuity=ignore_first,
                       moment_weights=weights,
                       variance_method=variance_method)
    assert abs(float(loss) - ref_loss) < 1e-4 * max(1.0, abs(ref_loss))


def test_gradient_parity(torch_reference):
    """End-to-end: d(loss)/d(params) matches torch autograd."""
    import torch
    cfg = dict(num_moments=2, shared_network=False, dt_ode_step=None,
               activation="tanh", n_hidden_layers=1, input_scaling="identity")
    ref_model, model, params = build_pair(torch_reference, cfg, hidden_dim=8)
    batch_times, batch_values = make_ragged_batch(seed=5, B=2)

    tt = [torch.tensor(t) for t in batch_times]
    tv = [torch.tensor(v) for v in batch_values]
    rp, rpb = ref_model(tt, tv)
    ref_loss = torch_reference.models.jump_ode.nj_ode_loss(
        tt, tv, rp, rpb, moment_weights=torch.tensor([1.0, 10.0]),
        variance_method="direct")
    ref_loss.backward()
    # reference grad of the first jump network's first Linear weight
    ref_g = ref_model.jump_nns[0].net[0].weight.grad.numpy().T

    from njode_tpu.models.jump_ode import pad_ragged
    times, values, mask = pad_ragged(batch_times, batch_values)

    def loss_fn(p):
        preds, preds_before = model.apply(p, times, values, mask)
        return nj_ode_loss(times, values, preds, preds_before,
                           moment_weights=[1.0, 10.0],
                           variance_method="direct", mask=mask)

    g = jax.grad(loss_fn)(params)
    my_g = np.asarray(g["jump"]["layers"][0]["w"][0])  # moment 0 stacked at K=0
    np.testing.assert_allclose(my_g, ref_g, rtol=5e-3, atol=1e-5)


@pytest.mark.parametrize("process_type,params_kw", [
    ("black_scholes", {"mu": 0.1, "sigma": 0.5}),
    ("ornstein_uhlenbeck", {"theta": 1.0, "mu": 0.5, "sigma": 0.3}),
    ("heston", {"mu": 0.5, "xi": 0.5}),
    ("hybrid_ou_bs", {"switch_time": 0.5, "theta_ou": 1.0, "mu_ou": 0.5,
                      "sigma_ou": 0.3, "mu_bs": 0.1, "sigma_bs": 0.2}),
])
def test_conditional_moments_parity(torch_reference, process_type, params_kw):
    import torch
    batch_times, batch_values = make_ragged_batch(seed=11)
    ref_fn = torch_reference.simulation.data_generation.get_conditional_moments_at_obs
    ref_m, ref_mb = ref_fn([torch.tensor(t) for t in batch_times],
                           [torch.tensor(v) for v in batch_values],
                           process_type=process_type, num_moments=2,
                           variance_method="direct", **params_kw)
    m, mb = get_conditional_moments_at_obs(batch_times, batch_values,
                                           process_type=process_type,
                                           num_moments=2,
                                           variance_method="direct",
                                           **params_kw)
    for b in range(len(batch_times)):
        np.testing.assert_allclose(np.asarray(m[b]), ref_m[b].numpy(),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(mb[b]), ref_mb[b].numpy(),
                                   rtol=1e-4, atol=1e-5)


def test_conditional_moments_parity_second_moment(torch_reference):
    import torch
    batch_times, batch_values = make_ragged_batch(seed=13)
    ref_fn = torch_reference.simulation.data_generation.get_conditional_moments_at_obs
    kw = dict(process_type="ornstein_uhlenbeck", num_moments=2,
              variance_method="second_moment", theta=2.0, mu=0.3, sigma=0.4)
    ref_m, ref_mb = ref_fn([torch.tensor(t) for t in batch_times],
                           [torch.tensor(v) for v in batch_values], **kw)
    m, mb = get_conditional_moments_at_obs(batch_times, batch_values, **kw)
    for b in range(len(batch_times)):
        np.testing.assert_allclose(np.asarray(m[b]), ref_m[b].numpy(),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(mb[b]), ref_mb[b].numpy(),
                                   rtol=1e-4, atol=1e-5)

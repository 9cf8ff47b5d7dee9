"""Randomized parity fuzz: random configs x random ragged batches vs torch.

Complements the fixed-config parity suite with randomized coverage of the
config cross-product (activation x scaling x dt x shared x K x depth) and
irregular batch shapes.
"""

import numpy as np
import pytest

from njode_tpu import NeuralJumpODE, nj_ode_loss
from njode_tpu.utils.torch_compat import params_from_torch_state_dict

N_TRIALS = 10


def random_config(rng):
    return dict(
        num_moments=int(rng.integers(1, 4)),
        shared_network=bool(rng.integers(0, 2)),
        dt_ode_step=float(rng.choice([0.0, 0.021, 0.09])) or None,
        activation=str(rng.choice(["relu", "tanh", "sigmoid", "elu",
                                   "leaky_relu", "selu"])),
        n_hidden_layers=int(rng.integers(1, 4)),
        input_scaling=str(rng.choice(["identity", "tanh", "sigmoid"])),
        hidden_dim=int(rng.choice([4, 16, 24])),
    )


def random_batch(rng, d_x):
    B = int(rng.integers(1, 5))
    bt, bv = [], []
    for _ in range(B):
        n = int(rng.integers(2, 9))
        t = np.sort(rng.uniform(0, 1, n)).astype(np.float32)
        t[0] = 0.0
        v = rng.normal(0.8, 0.5, (n, d_x)).astype(np.float32)
        bt.append(t)
        bv.append(v)
    return bt, bv


@pytest.mark.parametrize("trial", range(N_TRIALS))
def test_fuzzed_forward_and_loss_parity(torch_reference, trial):
    import torch
    rng = np.random.default_rng(1000 + trial)
    cfg = random_config(rng)
    d_x = int(rng.integers(1, 3))

    torch.manual_seed(trial)
    ref_model = torch_reference.models.jump_ode.NeuralJumpODE(
        input_dim=d_x, output_dim=d_x, dropout_rate=0.0, **cfg)
    ref_model.eval()
    model = NeuralJumpODE(input_dim=d_x, output_dim=d_x, dropout_rate=0.0,
                          t_max=1.0, **cfg)
    params = params_from_torch_state_dict(
        ref_model.state_dict(), cfg["num_moments"], cfg["shared_network"])

    bt, bv = random_batch(rng, d_x)
    with torch.no_grad():
        rp, rpb = ref_model([torch.tensor(t) for t in bt],
                            [torch.tensor(v) for v in bv])
    p, pb = model.forward(params, bt, bv)
    for b in range(len(bt)):
        np.testing.assert_allclose(np.asarray(p[b]), rp[b].numpy(),
                                   rtol=5e-4, atol=5e-5,
                                   err_msg=f"trial {trial} cfg {cfg}")
        np.testing.assert_allclose(np.asarray(pb[b]), rpb[b].numpy(),
                                   rtol=5e-4, atol=5e-5,
                                   err_msg=f"trial {trial} cfg {cfg}")

    if cfg["num_moments"] >= 2:
        vm = str(rng.choice(["direct", "second_moment"]))
        weights = rng.uniform(0.5, 5.0, cfg["num_moments"]).tolist()
        ref_loss = torch_reference.models.jump_ode.nj_ode_loss(
            [torch.tensor(t) for t in bt], [torch.tensor(v) for v in bv],
            rp, rpb, moment_weights=torch.tensor(weights),
            variance_method=vm).item()
        loss = float(nj_ode_loss(bt, bv, p, pb, moment_weights=weights,
                                 variance_method=vm))
        assert abs(loss - ref_loss) < 5e-4 * max(1.0, abs(ref_loss)), \
            f"trial {trial}: {loss} vs {ref_loss} ({cfg}, {vm})"

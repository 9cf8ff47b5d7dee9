"""Checkpoint migration between the reference and njode_tpu."""

import numpy as np
import pytest

import jax

from njode_tpu import NeuralJumpODE
from njode_tpu.simulation import simulate_batch
from njode_tpu.utils import Trainer, make_adam
from njode_tpu.utils.torch_compat import (params_from_torch_state_dict,
                                          params_to_torch_state_dict)


@pytest.mark.parametrize("shared,n_hidden", [(False, 1), (True, 2)])
def test_roundtrip_export_import(torch_reference, shared, n_hidden):
    """params -> torch state dict -> reference module -> back, lossless."""
    import torch
    K = 2
    model = NeuralJumpODE(input_dim=1, hidden_dim=8, output_dim=1,
                          num_moments=K, shared_network=shared,
                          n_hidden_layers=n_hidden)
    params = model.init(jax.random.PRNGKey(0))
    sd = params_to_torch_state_dict(params, K, shared, n_hidden)

    ref_model = torch_reference.models.jump_ode.NeuralJumpODE(
        input_dim=1, hidden_dim=8, output_dim=1, num_moments=K,
        shared_network=shared, n_hidden_layers=n_hidden)
    ref_model.load_state_dict(sd)  # raises on any name/shape mismatch

    params2 = params_from_torch_state_dict(ref_model.state_dict(), K, shared)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_continue_training_from_torch_checkpoint(torch_reference, tmp_path):
    """A reference model.pt loads and training continues from it."""
    import torch
    torch.manual_seed(0)
    K = 2
    ref_model = torch_reference.models.jump_ode.NeuralJumpODE(
        input_dim=1, hidden_dim=8, output_dim=1, num_moments=K)
    ckpt_path = tmp_path / "model.pt"
    torch.save({"model_state_dict": ref_model.state_dict()}, ckpt_path)

    from njode_tpu.utils.torch_compat import params_from_torch_checkpoint
    params = params_from_torch_checkpoint(str(ckpt_path), K, False)

    model = NeuralJumpODE(input_dim=1, hidden_dim=8, output_dim=1,
                          num_moments=K)
    trainer = Trainer(model, make_adam(1e-2), moment_weights=[1.0, 10.0])
    trainer.params = params
    trainer.opt_state = trainer.optimizer.init(params)
    batch = simulate_batch(jax.random.PRNGKey(1), 16, "black_scholes", 0.1)
    l0 = trainer.train_epoch(batch.times, batch.values)
    for _ in range(20):
        l = trainer.train_epoch(batch.times, batch.values)
    assert np.isfinite(l) and l < l0

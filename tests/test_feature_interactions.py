"""Cross-feature interaction tests.

Each new capability is tested alone in its own file; these pin the
combinations a production user will actually run: mixed precision under
data parallelism, Orbax checkpoints with a sharded trainer, the gap kernel
behind the serving filter, and the full kitchen sink through
``run_experiment``.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from njode_tpu import NeuralJumpODE, NJODEFilter
from njode_tpu.simulation import simulate_batch
from njode_tpu.utils.training import run_experiment


def test_bf16_with_data_parallel_mesh():
    """compute_dtype=bfloat16 trains under an 8-way DP mesh."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the virtual 8-device mesh")
    cfg = {
        "experiment_name": "bf16_dp",
        "input_dim": 1, "hidden_dim": 16, "output_dim": 1,
        "num_moments": 2, "n_hidden_layers": 1, "activation": "tanh",
        "learning_rate": 1e-2, "weight_decay": 0.0,
        "n_epochs": 4, "batch_size": 16, "print_every": 2,
        "moment_weights": [1.0, 10.0],
        "compute_dtype": "bfloat16",
        "data_parallel": 8,
        "data": dict(process_type="black_scholes", n_train=64, n_val=16,
                     obs_fraction=0.1, cache_data=True, mu=0.1, sigma=0.5,
                     T=1.0, n_steps=50, x0=1.0),
    }
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        res = run_experiment(cfg, save_dir=d)
        tl = res["history"]["train_loss"]
        assert np.isfinite(tl).all() and tl[-1] < tl[0]


def test_orbax_with_data_parallel_resume(tmp_path):
    """Orbax checkpoint + DP mesh: train, resume, extend."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the virtual 8-device mesh")
    cfg = {
        "experiment_name": "orbax_dp",
        "input_dim": 1, "hidden_dim": 8, "output_dim": 1,
        "num_moments": 2, "n_hidden_layers": 1, "activation": "relu",
        "learning_rate": 1e-2, "weight_decay": 5e-4,
        "n_epochs": 3, "batch_size": 16, "print_every": 2,
        "moment_weights": [1.0, 10.0],
        "checkpoint_backend": "orbax",
        "data_parallel": 4,
        "data": dict(process_type="ornstein_uhlenbeck", n_train=32, n_val=8,
                     obs_fraction=0.1, cache_data=True, theta=1.0, mu=0.5,
                     sigma=0.3, T=1.0, n_steps=50, x0=0.0),
    }
    res = run_experiment(cfg, save_dir=str(tmp_path))
    assert (tmp_path / "orbax_dp" / "model.ckpt").is_dir()
    cfg2 = json.loads(json.dumps(cfg))
    cfg2["n_epochs"] = 5
    res2 = run_experiment(cfg2, save_dir=str(tmp_path))
    assert len(res2["history"]["train_loss"]) == 5
    np.testing.assert_allclose(res2["history"]["train_loss"][:3],
                               res["history"]["train_loss"], rtol=1e-6)


def test_gap_kernel_through_serving_filter():
    """NJODEFilter predictions identical (to kernel tolerance) with the
    fused gap kernel vs the XLA path."""
    kw = dict(input_dim=1, hidden_dim=24, output_dim=1, num_moments=2,
              activation="tanh", dt_ode_step=0.02, t_max=1.0)
    ref_model = NeuralJumpODE(use_pallas=False, **kw)
    ker_model = NeuralJumpODE(use_pallas="interpret", **kw)
    params = ref_model.init(jax.random.PRNGKey(0))

    f_ref = NJODEFilter(ref_model, params)
    f_ker = NJODEFilter(ker_model, params)
    s_ref = f_ref.init_state(4)
    s_ker = f_ker.init_state(4)

    t_obs = jnp.asarray([0.1, 0.12, 0.08, 0.1])
    x_obs = jnp.asarray([[1.0], [0.8], [1.2], [0.9]])
    s_ref = f_ref.update(s_ref, t_obs, x_obs)
    s_ker = f_ker.update(s_ker, t_obs, x_obs)

    q = jnp.full((4,), 0.5)
    p_ref = f_ref.predict(s_ref, q)
    p_ker = f_ker.predict(s_ker, q)
    np.testing.assert_allclose(np.asarray(p_ref["mean"]),
                               np.asarray(p_ker["mean"]), rtol=2e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(p_ref["var"]),
                               np.asarray(p_ker["var"]), rtol=2e-4,
                               atol=1e-6)


def test_kitchen_sink_run_experiment(tmp_path):
    """Everything at once: 2-D correlated OU data, rk4 solver, bf16 compute,
    orbax checkpointing, DP mesh, extended dt substeps."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the virtual 8-device mesh")
    cfg = {
        "experiment_name": "kitchen_sink",
        "input_dim": 2, "hidden_dim": 16, "output_dim": 2,
        "num_moments": 2, "n_hidden_layers": 1, "activation": "tanh",
        "learning_rate": 1e-2, "weight_decay": 0.0,
        "n_epochs": 4, "batch_size": 16, "print_every": 2,
        "moment_weights": [1.0, 10.0],
        "ode_solver": "rk4", "dt_ode_step": 0.05,
        "compute_dtype": "bfloat16",
        "checkpoint_backend": "orbax",
        "data_parallel": 4,
        "data": dict(process_type="ornstein_uhlenbeck_nd",
                     n_train=32, n_val=8, obs_fraction=0.1,
                     cache_data=True, dims=2, theta=[1.0, 2.0],
                     mu=[0.5, -0.5], sigma=[0.3, 0.4],
                     corr=[[1.0, 0.5], [0.5, 1.0]],
                     T=1.0, n_steps=50, x0=[0.0, 1.0]),
    }
    res = run_experiment(cfg, save_dir=str(tmp_path))
    h = res["history"]
    assert np.isfinite(h["train_loss"]).all()
    assert h["train_loss"][-1] < h["train_loss"][0]
    rl = [r for r in h["relative_loss"] if r == r]
    assert rl, "relative loss must work for the nd process"
    assert (tmp_path / "kitchen_sink" / "model.ckpt").is_dir()

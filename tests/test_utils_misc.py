"""Small utilities: profiling timer, backend fallback, plotting functions."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from njode_tpu.utils.profiling import StepTimer, compile_time, maybe_trace
from njode_tpu.utils.backend import ensure_backend
from njode_tpu.parallel import initialize_distributed


def test_step_timer_blocks():
    t = StepTimer()
    x = jnp.ones((64, 64))
    f = jax.jit(lambda a: a @ a)
    y = f(x)  # compile outside
    with t.measure(y):
        y = f(x)
    assert t.mean > 0
    assert len(t.times) == 1


def test_compile_time_positive():
    assert compile_time(lambda a: a * 2, jnp.ones((4,))) >= 0


def test_maybe_trace_none_is_noop():
    with maybe_trace(None):
        pass


def test_ensure_backend_returns_devices():
    devs = ensure_backend()
    assert len(devs) >= 1


def test_initialize_distributed_single_process():
    assert initialize_distributed() == 0
    # idempotent
    assert initialize_distributed() == 0


def test_plotting_functions(tmp_path):
    from njode_tpu.utils.plotting import (plot_relative_loss,
                                          plot_training_history)
    hist = {"train_loss": [1.0, 0.5], "val_loss": [1.1, 0.6],
            "epoch_times": [0.1, 0.1], "relative_loss": [5.0, 2.0]}
    hp = tmp_path / "history.json"
    hp.write_text(json.dumps(hist))
    plot_training_history(str(hp), str(tmp_path / "th.png"))
    assert (tmp_path / "th.png").exists()
    plot_relative_loss([str(hp)], ["x"], str(tmp_path / "rl.png"))
    assert (tmp_path / "rl.png").exists()
    # missing file degrades with a warning, like the reference
    plot_relative_loss([str(tmp_path / "nope.json")], ["y"],
                       str(tmp_path / "rl2.png"))


def test_trajectory_plot_function(tmp_path):
    from njode_tpu import NeuralJumpODE
    from njode_tpu.utils.plotting import plot_single_trajectory_with_condexp
    model = NeuralJumpODE(input_dim=1, hidden_dim=8, output_dim=1,
                          num_moments=2)
    params = model.init(jax.random.PRNGKey(0))
    plot_single_trajectory_with_condexp(
        model, params, "ornstein_uhlenbeck",
        {"theta": 1.0, "mu": 0.5, "sigma": 0.3, "T": 1.0, "n_steps": 30,
         "x0": 0.0},
        obs_fraction=0.2, seed=7, save_path=str(tmp_path / "traj.png"))
    assert (tmp_path / "traj.png").exists()

"""Population training (utils/ensemble.py train_population): K models
differing in OPTIMIZER hyperparameters train in one vmapped program.

Pins: exact member equivalence with uniform-hyperparameter ensembles (the
inject_hyperparams chain is numerically make_adam), validation of the
member_hparams hook, and the --ensemble-lrs experiment plumbing.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from njode_tpu import NeuralJumpODE
from njode_tpu.utils.ensemble import (population_adam, train_ensemble_full,
                                      train_population)
from njode_tpu.utils.training import make_adam

MODEL_KW = dict(input_dim=1, hidden_dim=8, output_dim=1, num_moments=2,
                n_hidden_layers=1)
TRAIN_KW = dict(n_trajectories=32, batch_size=16, obs_fraction=0.2,
                n_steps=20, T=1.0, mu=0.1, sigma=0.5, x0=1.0)


def test_population_members_match_uniform_ensembles():
    """Member k of a [lr_a, lr_b] population must reproduce member k of a
    uniform ensemble trained entirely at lr_k (same seeds, shared data):
    the hyperparameters are the ONLY thing that differs per member, and
    population_adam's inject chain is numerically make_adam."""
    model = NeuralJumpODE(**MODEL_KW)
    lrs, wd = (1e-3, 1e-2), 5e-4

    def uniform(lr):
        _, _, hist = train_ensemble_full(
            model, "black_scholes", n_seeds=2, n_epochs=4,
            optimizer=make_adam(lr, wd), share_data=True, **TRAIN_KW)
        return np.asarray(hist["train"])

    l_a = uniform(lrs[0])
    l_b = uniform(lrs[1])
    _, _, hist = train_population(
        model, "black_scholes", learning_rates=list(lrs), n_epochs=4,
        weight_decays=wd, **TRAIN_KW)
    l_p = np.asarray(hist["train"])

    assert l_p.shape == (4, 2)
    np.testing.assert_allclose(l_p[:, 0], l_a[:, 0], rtol=1e-6)
    np.testing.assert_allclose(l_p[:, 1], l_b[:, 1], rtol=1e-6)
    # the two members genuinely trained at different rates
    assert not np.allclose(l_p[:, 0], l_p[:, 1])


def test_member_hparams_validation():
    model = NeuralJumpODE(**MODEL_KW)
    with pytest.raises(ValueError, match="inject_hyperparams"):
        train_ensemble_full(model, "black_scholes", n_seeds=2, n_epochs=1,
                            optimizer=make_adam(1e-3),
                            member_hparams={"learning_rate":
                                            jnp.ones((2,))},
                            **TRAIN_KW)
    with pytest.raises(ValueError, match="not in the"):
        train_ensemble_full(model, "black_scholes", n_seeds=2, n_epochs=1,
                            optimizer=population_adam(),
                            member_hparams={"lr": jnp.ones((2,))},
                            **TRAIN_KW)
    with pytest.raises(ValueError, match="n_seeds"):
        train_ensemble_full(model, "black_scholes", n_seeds=2, n_epochs=1,
                            optimizer=population_adam(),
                            member_hparams={"learning_rate":
                                            jnp.ones((3,))},
                            **TRAIN_KW)
    with pytest.raises(ValueError, match="one-dimensional"):
        train_population(model, "black_scholes",
                         learning_rates=jnp.ones((2, 2)), n_epochs=1,
                         **TRAIN_KW)


def test_population_experiment(tmp_path):
    """run_experiment with config['ensemble_lrs']: population history
    schema (per-member matrices + ensemble_lrs), and the best member is
    learnable from the recorded losses."""
    from njode_tpu.utils.training import run_experiment

    config = {
        "experiment_name": "pop", "input_dim": 1, "hidden_dim": 8,
        "output_dim": 1, "n_hidden_layers": 1, "activation": "relu",
        "learning_rate": 1e-3, "weight_decay": 0.0, "n_epochs": 4,
        "batch_size": 16, "print_every": 2, "ignore_first_continuity": True,
        "num_moments": 2,
        # no "ensemble" key: ensemble_lrs alone must imply the member
        # count (a config-dict caller must never silently get one model)
        "ensemble_lrs": [1e-2, 1e-3, 1e-4],
        "data": {"process_type": "black_scholes", "n_train": 32,
                 "n_val": 8, "obs_fraction": 0.2, "cache_data": True,
                 "n_steps": 20, "T": 1.0, "mu": 0.1, "sigma": 0.5,
                 "x0": 1.0},
    }
    res = run_experiment(config, save_dir=str(tmp_path))
    hist = json.loads((tmp_path / "pop" / "history.json").read_text())
    assert hist["ensemble_lrs"] == [1e-2, 1e-3, 1e-4]
    m = np.asarray(hist["member_train_loss"])
    assert m.shape == (4, 3)
    assert np.all(np.isfinite(m))
    mv = np.asarray(hist["member_val_loss"])
    assert mv.shape == (4, 3)
    # different lrs produce genuinely different members
    assert not np.allclose(m[:, 0], m[:, 2])
    assert res["final_train_loss"] == pytest.approx(float(np.mean(m[-1])))
    assert hist["best_member"] == int(np.argmin(mv[-1]))


def test_population_winner_nan_safe():
    """A diverged (NaN) member must never be declared the winning lr."""
    from njode_tpu.utils.training import _population_winner

    rows = {"val": [[float("nan"), 0.02, 0.05]], "train": [[1.0, 2.0, 3.0]]}
    assert _population_winner(rows) == (1, "val")
    rows = {"val": [], "train": [[float("nan"), 0.7, 0.3]]}
    assert _population_winner(rows) == (2, "train")
    rows = {"val": [[float("nan")] * 2], "train": [[1.0, 2.0]]}
    assert _population_winner(rows) == (None, "val")
    assert _population_winner({"val": [], "train": []}) == (None, None)

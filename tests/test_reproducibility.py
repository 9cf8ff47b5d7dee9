"""Full-run determinism: identical seeds => identical histories."""

import json

import numpy as np

from njode_tpu.utils import run_experiment

CFG = dict(
    experiment_name="repro", input_dim=1, hidden_dim=8, output_dim=1,
    learning_rate=1e-2, weight_decay=5e-4, n_epochs=3, batch_size=8,
    print_every=1, num_moments=2, moment_weights=[1.0, 10.0],
    ignore_first_continuity=True, seed=7, data_seed=3,
    data=dict(process_type="black_scholes", n_train=16, n_val=8,
              obs_fraction=0.1, cache_data=False, mu=0.1, sigma=0.5,
              T=1.0, n_steps=30, x0=1.0))


def test_runs_are_bit_reproducible(tmp_path):
    r1 = run_experiment(json.loads(json.dumps(CFG)), save_dir=str(tmp_path / "a"))
    r2 = run_experiment(json.loads(json.dumps(CFG)), save_dir=str(tmp_path / "b"))
    np.testing.assert_array_equal(r1["history"]["train_loss"],
                                  r2["history"]["train_loss"])
    np.testing.assert_array_equal(r1["history"]["val_loss"],
                                  r2["history"]["val_loss"])
    np.testing.assert_array_equal(r1["history"]["relative_loss"],
                                  r2["history"]["relative_loss"])

    # different data seed changes the run
    cfg3 = json.loads(json.dumps(CFG))
    cfg3["data_seed"] = 4
    r3 = run_experiment(cfg3, save_dir=str(tmp_path / "c"))
    assert r3["history"]["train_loss"] != r1["history"]["train_loss"]

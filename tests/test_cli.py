"""Experiment-CLI end-to-end tests (subprocess, CPU)."""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.slow

REPO = Path(__file__).parent.parent


def run_cli(script, args, cwd):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # keep the axon TPU out of subprocs
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = str(REPO)
    return subprocess.run(
        [sys.executable, str(REPO / "experiments" / script),
         "--device", "cpu", *args],
        cwd=cwd, env=env, capture_output=True, text=True, timeout=540)


TINY = ["--n-train", "8", "--n-val", "4", "--n-epochs", "4",
        "--batch-size", "4", "--print-every", "2", "--n-steps", "20"]


@pytest.mark.parametrize("script,name", [
    ("experiment_black_scholes.py", "njode_black_scholes"),
    ("experiment_ou.py", "njode_ou"),
    ("experiment_heston.py", "njode_heston"),
    ("experiment_hybrid.py", "njode_hybrid"),
])
def test_experiment_cli(tmp_path, script, name):
    r = run_cli(script, TINY, cwd=tmp_path)
    assert r.returncode == 0, r.stdout + r.stderr
    d = tmp_path / "runs" / name
    assert (d / "config.json").exists()
    assert (d / "history.json").exists()
    assert (d / "model.ckpt").exists()
    assert (d / "training_history.png").exists()
    assert (d / "trajectory_comparison.png").exists()
    history = json.loads((d / "history.json").read_text())
    assert len(history["train_loss"]) == 4
    assert all(x == x for x in history["train_loss"])  # no NaN
    # kernel-engagement report: one line per run, no silent '--kernels auto'
    # degradation (each declined kernel states its first failing reason)
    assert "Kernels: walk=" in r.stdout, r.stdout
    # --obs-only defaults to auto: exact obs-time sampling wherever the
    # process has a transition law (the same fast path bench measures)
    from njode_tpu.simulation import supports_obs_only
    config = json.loads((d / "config.json").read_text())
    assert config["data"]["obs_only"] == supports_obs_only(
        config["data"]["process_type"])


def test_train_kernel_cli(tmp_path):
    """--kernels train: the whole-run training kernel drives the CLI run
    (Pallas interpreter off-TPU) and produces the standard artifacts."""
    r = run_cli("experiment_black_scholes.py",
                ["--n-train", "16", "--n-val", "8", "--n-epochs", "2",
                 "--batch-size", "8", "--print-every", "1",
                 "--n-steps", "20", "--kernels", "train", "--no-plots"],
                cwd=tmp_path)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "Pallas interpreter" in r.stdout
    d = tmp_path / "runs" / "njode_black_scholes"
    history = json.loads((d / "history.json").read_text())
    assert len(history["train_loss"]) == 2
    assert len(history["val_loss"]) == 2
    config = json.loads((d / "config.json").read_text())
    assert config["use_pallas"] == "train"


def test_train_kernel_cli_rejects_bad_config(tmp_path):
    """--kernels train with an ineligible model fails fast, listing every
    problem (no silent XLA fallback)."""
    r = run_cli("experiment_black_scholes.py",
                ["--n-train", "16", "--n-val", "8", "--n-epochs", "2",
                 "--batch-size", "12", "--dropout-rate", "0.3",
                 "--n-steps", "20", "--kernels", "train", "--no-plots"],
                cwd=tmp_path)
    assert r.returncode != 0
    assert "not applicable" in r.stdout + r.stderr
    assert "multiple of 8" in r.stdout + r.stderr


def test_train_kernel_cli_rejects_ensemble(tmp_path):
    """--kernels train + --ensemble raises (ensembles measured faster on
    the XLA vmapped path, BENCH_NOTES r3c) instead of silently ignoring
    a flag."""
    r = run_cli("experiment_black_scholes.py",
                ["--n-train", "16", "--n-val", "8", "--n-epochs", "2",
                 "--batch-size", "8", "--n-steps", "20", "--ensemble", "2",
                 "--kernels", "train", "--no-plots"],
                cwd=tmp_path)
    assert r.returncode != 0
    assert "single-model strategy" in r.stdout + r.stderr


def test_compare_cli(tmp_path):
    r = run_cli("experiment_black_scholes.py", TINY + ["--no-plots"],
                cwd=tmp_path)
    assert r.returncode == 0, r.stdout + r.stderr
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = str(REPO)
    r2 = subprocess.run(
        [sys.executable, str(REPO / "experiments" / "compare_experiments.py")],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=180)
    assert r2.returncode == 0, r2.stdout + r2.stderr
    assert "Black-Scholes" in r2.stdout
    assert (tmp_path / "runs" / "comparison_relative_loss.png").exists()


def test_ensemble_cli(tmp_path):
    """--ensemble K: stacked checkpoint, member losses, seed-band plot."""
    r = run_cli("experiment_black_scholes.py",
                TINY + ["--ensemble", "3", "--obs-only", "auto"],
                cwd=tmp_path)
    assert r.returncode == 0, r.stdout + r.stderr
    d = tmp_path / "runs" / "njode_black_scholes"
    history = json.loads((d / "history.json").read_text())
    assert history["n_ensemble"] == 3
    assert len(history["member_train_loss"]) == 4
    assert all(len(row) == 3 for row in history["member_train_loss"])
    assert (d / "trajectory_comparison.png").exists()
    # the stacked checkpoint reloads against an ensemble template
    import jax
    from njode_tpu.models import NeuralJumpODE
    from njode_tpu.utils.checkpoint import load_params
    from njode_tpu.utils.ensemble import init_ensemble
    model = NeuralJumpODE(input_dim=1, hidden_dim=32, output_dim=1,
                          num_moments=2)
    stack = load_params(str(d / "model.ckpt"), init_ensemble(model, 3))
    leaf = jax.tree_util.tree_leaves(stack)[0]
    assert leaf.shape[0] == 3


def test_population_cli(tmp_path):
    """--ensemble-lrs: a learning-rate sweep as ONE vmapped run — implies
    the member count, records per-member losses + the lr list, resumes."""
    flags = TINY + ["--ensemble-lrs", "1e-2,1e-3"]
    r = run_cli("experiment_black_scholes.py", flags, cwd=tmp_path)
    assert r.returncode == 0, r.stdout + r.stderr
    d = tmp_path / "runs" / "njode_black_scholes"
    history = json.loads((d / "history.json").read_text())
    assert history["n_ensemble"] == 2
    assert history["ensemble_lrs"] == [1e-2, 1e-3]
    m = history["member_train_loss"]
    assert len(m) == 4 and all(len(row) == 2 for row in m)
    assert m[-1][0] != m[-1][1]          # the lrs genuinely differed
    # completed run: a re-invocation resumes and exits without retraining
    r2 = run_cli("experiment_black_scholes.py", flags, cwd=tmp_path)
    assert r2.returncode == 0, r2.stdout + r2.stderr
    assert "already completed" in r2.stdout
    # count mismatch fails fast
    r3 = run_cli("experiment_black_scholes.py",
                 TINY + ["--ensemble", "3", "--ensemble-lrs", "1e-2,1e-3"],
                 cwd=tmp_path)
    assert r3.returncode != 0
    assert "does not match" in r3.stdout + r3.stderr

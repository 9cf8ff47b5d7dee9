"""Experiment-CLI end-to-end tests (subprocess, CPU)."""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

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

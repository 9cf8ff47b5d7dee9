"""Sweep orchestration + aggregation tests.

Covers the reference's array-job study workflow (reference
run_array_job.sh:23-47) the TPU-native way: concurrent experiment runs with
per-config run directories (``--experiment-name``) aggregated by
``compare_experiments.py --sweep`` into a CSV + PNG results table.
"""

import csv
import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.slow

REPO = Path(__file__).parent.parent


def _env():
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = str(REPO)
    return env


TINY = ["--n-train", "8", "--n-val", "4", "--n-epochs", "2",
        "--batch-size", "4", "--print-every", "1", "--n-steps", "10",
        "--no-plots", "--device", "cpu"]


def _fake_run(runs: Path, name: str, hidden: int, layers: int,
              val_loss: float):
    d = runs / name
    d.mkdir(parents=True)
    (d / "config.json").write_text(json.dumps(
        {"experiment_name": name, "hidden_dim": hidden,
         "n_hidden_layers": layers}))
    (d / "history.json").write_text(json.dumps(
        {"train_loss": [2.0, 1.0], "val_loss": [2.5, val_loss],
         "relative_loss": [float("nan"), 0.5],
         "epoch_times": [0.2, 0.1]}))


def test_sweep_aggregation(tmp_path):
    """--sweep reads config+history per run dir and emits CSV + PNG."""
    runs = tmp_path / "runs"
    for h, l, v in [(32, 1, 1.5), (32, 2, 1.2), (64, 1, 1.1), (64, 2, 0.9)]:
        _fake_run(runs, f"sweep_h{h}_l{l}", h, l, v)

    r = subprocess.run(
        [sys.executable, str(REPO / "experiments" / "compare_experiments.py"),
         "--sweep", "runs/sweep_*"],
        cwd=tmp_path, env=_env(), capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stdout + r.stderr

    csv_path = runs / "sweep_results.csv"
    assert csv_path.exists()
    with open(csv_path) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 4
    by_run = {row["run"]: row for row in rows}
    assert float(by_run["sweep_h64_l2"]["final_val_loss"]) == 0.9
    assert float(by_run["sweep_h32_l1"]["final_relative_loss"]) == 0.5
    assert abs(float(by_run["sweep_h32_l1"]["walltime_s"]) - 0.3) < 1e-9
    # full 2x2 grid -> the heatmap PNG
    assert (runs / "sweep_results.png").exists()


def test_concurrent_sweep_configs(tmp_path):
    """Two experiment CLIs run CONCURRENTLY into distinct run dirs via
    --experiment-name, then aggregate — the run_sweep.sh mechanism."""
    procs = []
    for hidden in (8, 12):
        procs.append(subprocess.Popen(
            [sys.executable,
             str(REPO / "experiments" / "experiment_black_scholes.py"),
             "--hidden-dim", str(hidden),
             "--experiment-name", f"sweep_h{hidden}_l1", *TINY],
            cwd=tmp_path, env=_env(), stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True))
    for p in procs:
        out, _ = p.communicate(timeout=540)
        assert p.returncode == 0, out

    for hidden in (8, 12):
        d = tmp_path / "runs" / f"sweep_h{hidden}_l1"
        config = json.loads((d / "config.json").read_text())
        assert config["hidden_dim"] == hidden
        history = json.loads((d / "history.json").read_text())
        assert len(history["train_loss"]) == 2

    r = subprocess.run(
        [sys.executable, str(REPO / "experiments" / "compare_experiments.py"),
         "--sweep", "runs/sweep_*"],
        cwd=tmp_path, env=_env(), capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stdout + r.stderr
    with open(tmp_path / "runs" / "sweep_results.csv") as f:
        rows = list(csv.DictReader(f))
    assert {row["run"] for row in rows} == {"sweep_h8_l1", "sweep_h12_l1"}


def _script_env():
    env = _env()
    env["SWEEP_JOBS"] = "3"
    return env


def _copy_tree(tmp_path):
    """run_sweep.sh cds to its parent dir; run a COPY so repo runs/ stays
    clean while PYTHONPATH still resolves njode_tpu from the repo."""
    import shutil
    shutil.copytree(REPO / "scripts", tmp_path / "scripts")
    shutil.copytree(REPO / "experiments", tmp_path / "experiments")


def test_run_sweep_script_end_to_end(tmp_path):
    """The ACTUAL run_sweep.sh: 9 configs through the rolling pool, then
    aggregation into runs/sweep_results.{csv,png}."""
    _copy_tree(tmp_path)
    r = subprocess.run(
        ["bash", str(tmp_path / "scripts" / "run_sweep.sh"), *TINY],
        cwd=tmp_path, env=_script_env(), capture_output=True,
        text=True, timeout=540)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    runs = tmp_path / "runs"
    names = {f"sweep_h{h}_l{l}" for h in (32, 50, 100) for l in (1, 2, 3)}
    assert names <= {p.name for p in runs.iterdir()}
    with open(runs / "sweep_results.csv") as f:
        rows = list(csv.DictReader(f))
    assert {row["run"] for row in rows} == names
    assert (runs / "sweep_results.png").exists()


def test_run_sweep_script_failure_aborts(tmp_path):
    """A failing config stops the sweep: nonzero exit, no stragglers, and
    no configs beyond the first in-flight batch are launched."""
    _copy_tree(tmp_path)
    # an invalid flag value makes every experiment subprocess exit nonzero
    # regardless of how njode_tpu is importable (PYTHONPATH or installed)
    r = subprocess.run(
        ["bash", str(tmp_path / "scripts" / "run_sweep.sh"), *TINY,
         "--learning-rate", "not-a-number"],
        cwd=tmp_path, env=_script_env(),
        capture_output=True, text=True, timeout=300)
    assert r.returncode != 0
    assert "sweep config failed" in r.stdout + r.stderr
    launched = (r.stdout + r.stderr).count("=== sweep:")
    assert launched <= 4  # first pool (3) + at most one more slot

"""bench.py contract: exactly one JSON line on stdout with the driver's keys."""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.slow

REPO = Path(__file__).parent.parent


def test_bench_quick_contract(tmp_path):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = str(REPO)
    r = subprocess.run(
        [sys.executable, str(REPO / "bench.py"), "--quick"],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=540)
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [l for l in r.stdout.strip().splitlines() if l.strip()]
    assert len(lines) == 1, f"stdout must be ONE JSON line, got: {r.stdout!r}"
    payload = json.loads(lines[0])
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert key in payload
    assert payload["value"] > 0
    assert payload["unit"] == "trajectories/sec/chip"
    # quick preset respects explicit overrides
    r2 = subprocess.run(
        [sys.executable, str(REPO / "bench.py"), "--quick", "--n-epochs", "3"],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=540)
    assert r2.returncode == 0, r2.stderr[-2000:]
    p2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert p2["n_epochs"] == 3


def test_bench_pallas_train_requires_tpu(tmp_path):
    """Explicit --pallas-train fails fast with a clear message off TPU
    instead of crashing inside an un-lowerable Mosaic program."""
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = str(REPO)
    r = subprocess.run(
        [sys.executable, str(REPO / "bench.py"), "--quick", "--pallas-train"],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=540)
    assert r.returncode != 0
    assert "requires a real TPU" in (r.stderr + r.stdout)

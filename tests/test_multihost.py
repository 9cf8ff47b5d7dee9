"""Multi-host training integration: 2 REAL processes on CPU.

Proves the SURVEY §2b row-P3 target end-to-end: ``jax.distributed`` over a
localhost coordinator (4 virtual devices per process -> one 8-device global
mesh), a data-parallel training step whose loss matches the single-process
8-device run bit-for-bit, and an Orbax checkpoint written collectively by
both processes and restored on resume.  The reference has no multi-machine
mechanism beyond independent SLURM jobs (reference run_array_job.sh:23-47).
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.slow

WORKER = Path(__file__).parent / "multihost_worker.py"


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _worker_env() -> dict:
    env = dict(os.environ)
    # a clean CPU backend: drop the ambient tunneled-TPU registration and
    # give each process 4 virtual devices (see CLAUDE.md environment notes)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = str(WORKER.parent.parent)
    return env


@pytest.fixture(scope="module")
def two_process_run(tmp_path_factory):
    """Launch the 2-process worker pair once; yield their parsed outputs."""
    workdir = tmp_path_factory.mktemp("mh_runs")
    port = _free_port()
    env = _worker_env()
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(i), "2", str(port),
             str(workdir)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, cwd=str(WORKER.parent.parent))
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, (
            f"worker {i} failed (rc={p.returncode}):\n{out}")
    return outs


def _extract(out: str, tag: str) -> str:
    for line in out.splitlines():
        if line.startswith(tag + " "):
            return line.split(" ", 1)[1].strip()
    raise AssertionError(f"{tag} not found in worker output:\n{out}")


def test_dp_step_matches_across_processes(two_process_run):
    """Both processes compute the identical global training-step loss."""
    losses = [_extract(o, "STEP_LOSS") for o in two_process_run]
    assert losses[0] == losses[1], f"process losses differ: {losses}"


def test_dp_step_matches_single_process(two_process_run):
    """2 processes x 4 devices == 1 process x 8 devices.

    The forward pass is communication-free under DP, so its predictions must
    match BIT-FOR-BIT (sha256 over the gathered bytes).  The loss reduction
    crosses devices through an all-reduce whose summation order differs
    between the intra-process XLA collective and the cross-process gloo
    collective, so the scalar is compared at float32 reduction-order
    tolerance instead (measured difference ~8e-8 relative).
    """
    from multihost_worker import phase_a_step
    single_loss, single_hash = phase_a_step()
    multi_loss = float.fromhex(_extract(two_process_run[0], "STEP_LOSS"))
    multi_hash = _extract(two_process_run[0], "PRED_HASH")
    assert single_hash == multi_hash, "forward predictions differ bitwise"
    assert abs(single_loss - multi_loss) <= 1e-6 * abs(single_loss), (
        f"single-process {single_loss!r} != two-process {multi_loss!r}")


def test_run_experiment_multihost_orbax_resume(two_process_run):
    """run_experiment(multihost=True) trains, checkpoints via Orbax across
    both processes, and resumes from the restored checkpoint."""
    finals = []
    for out in two_process_run:
        assert "RESUME_OK" in out, f"resume failed:\n{out}"
        finals.append(float.fromhex(_extract(out, "FINAL_LOSS")))
    assert finals[0] == finals[1]
    import math
    assert math.isfinite(finals[0])


def test_multihost_model_axis_matches_single_process(two_process_run):
    """--model-parallel 2 under --multihost: the (data=4, model=2) mesh
    spans both processes with the moment networks sharded over the model
    axis (EP), and the result matches the same config run single-process
    on the 8-device virtual mesh at collective reduction tolerance."""
    import copy

    from multihost_worker import EP_CONFIG
    from njode_tpu.utils.training import run_experiment

    multi = [float.fromhex(_extract(o, "EP_LOSS")) for o in two_process_run]
    assert multi[0] == multi[1]

    import tempfile
    with tempfile.TemporaryDirectory() as d:
        cfg = copy.deepcopy(EP_CONFIG)
        cfg["checkpoint_backend"] = "msgpack"
        single = run_experiment(cfg, save_dir=d)["final_train_loss"]
    assert abs(single - multi[0]) <= 1e-5 * abs(single), (
        f"single-process {single!r} != two-process {multi[0]!r}")


def test_multihost_sharded_ensemble(two_process_run):
    """--ensemble 8 --multihost: the seed axis shards over both processes'
    devices; per-member histories recorded; matches the single-process
    sharded run at reduction tolerance."""
    import copy

    from multihost_worker import ENS_CONFIG
    from njode_tpu.utils.training import run_experiment

    multi = [float.fromhex(_extract(o, "ENS_LOSS")) for o in two_process_run]
    assert multi[0] == multi[1]

    import tempfile
    with tempfile.TemporaryDirectory() as d:
        cfg = copy.deepcopy(ENS_CONFIG)
        cfg["data_parallel"] = 8  # single-process: same seed-axis sharding
        single = run_experiment(cfg, save_dir=d)["final_train_loss"]
    assert abs(single - multi[0]) <= 1e-5 * abs(single), (
        f"single-process {single!r} != two-process {multi[0]!r}")

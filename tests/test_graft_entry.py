"""Regression tests for the driver entry points (__graft_entry__.py).

The driver validates the repo through two surfaces: ``entry()`` (single-chip
compile check) and ``dryrun_multichip(n)`` (virtual n-device mesh).  The
multi-chip path depends on ``_force_cpu_devices`` conjuring n virtual CPU
devices, which only works if XLA_FLAGS is set BEFORE jax creates its first
backend — xla_force_host_platform_device_count is read at client creation
and never re-read, so the ordering regressed silently once (the script
probed ``jax.devices()`` first, initializing the backend and turning the
flag into a no-op whenever the env var wasn't preset by the caller).

These tests spawn fresh interpreters so backend initialization state is
real, not inherited from the test process.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(code: str, *, preset_env: bool) -> str:
    """Run a snippet in a fresh interpreter from the repo root.

    ``preset_env=False`` scrubs XLA_FLAGS/JAX_PLATFORMS — the standalone
    ``python __graft_entry__.py N`` launch the fix targets; ``True``
    mirrors the driver, which exports both before the interpreter starts.
    """
    env = dict(os.environ)
    if preset_env:
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
        env["JAX_PLATFORMS"] = "cpu"
    else:
        env.pop("XLA_FLAGS", None)
        env.pop("JAX_PLATFORMS", None)
    out = subprocess.run([sys.executable, "-c", code], cwd=REPO, env=env,
                         capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr
    return out.stdout


FORCE_SNIPPET = """
import __graft_entry__ as g
g._force_cpu_devices(4)
import jax
print(len(jax.devices()), jax.devices()[0].platform)
"""


@pytest.mark.slow
def test_force_cpu_devices_without_env_preset():
    # The regression case: nothing preset, the function itself must set
    # XLA_FLAGS before any backend exists (and must never touch the TPU).
    stdout = _run(FORCE_SNIPPET, preset_env=False)
    n, platform = stdout.split()
    assert int(n) >= 4
    assert platform == "cpu"


@pytest.mark.slow
def test_force_cpu_devices_with_driver_env():
    # The driver's form: env exported before launch; the early-return path
    # must accept the already-forced backend.
    stdout = _run(FORCE_SNIPPET, preset_env=True)
    n, platform = stdout.split()
    assert int(n) >= 4
    assert platform == "cpu"

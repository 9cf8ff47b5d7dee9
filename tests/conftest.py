"""Test configuration.

Runs the whole suite on a virtual 8-device CPU mesh — the JAX-native "fake
backend" for exercising sharding/pjit paths without TPU hardware
(SURVEY.md §4 test plan item d).  Env vars must be set before jax imports.
"""

import os

# force CPU: the ambient environment presets JAX_PLATFORMS=axon (tunneled
# TPU), which is single-device and has multi-second compile RPCs.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The ambient sitecustomize force-registers the axon TPU backend and sets
# jax_platforms="axon,cpu" AFTER env vars are read — override it back.
jax.config.update("jax_platforms", "cpu")

# reproducible matmuls for numeric parity tests; cache compiles across runs
jax.config.update("jax_default_matmul_precision", "highest")
try:
    cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
except Exception:
    pass

import pytest  # noqa: E402


REFERENCE_PATH = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_PATH, "neural_jump_ode"))


@pytest.fixture(scope="session")
def torch_reference():
    """Import the PyTorch reference implementation for numeric parity tests.

    Skips cleanly when the reference checkout isn't mounted (e.g. CI on the
    standalone repo).
    """
    if not reference_available():
        pytest.skip("reference repo not available at /root/reference")
    import sys
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import neural_jump_ode as ref  # noqa
    import neural_jump_ode.models.jump_ode  # noqa
    import neural_jump_ode.simulation.data_generation  # noqa
    return ref

#!/bin/bash
# Environment sanity check + one-off warmup for a TPU VM.
# Counterpart of the reference's setup_euler.sh (venv bootstrap on the
# cluster): here the stack is jax/optax/flax, and the useful one-off work is
# verifying the accelerator and pre-warming the persistent compile cache.
set -euo pipefail
cd "$(dirname "$0")/.."

python - <<'PY'
import jax, optax, flax
print(f"jax {jax.__version__} | optax {optax.__version__} | flax {flax.__version__}")
from njode_tpu.utils.backend import ensure_backend
devs = ensure_backend()
print(f"devices: {devs}")
PY

echo "Running test suite (CPU)..."
python -m pytest tests/ -q -x

echo "Warming the compile cache with a quick benchmark..."
python bench.py --quick

echo "Setup OK."

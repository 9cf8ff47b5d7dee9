#!/usr/bin/env bash
# Recommended modern production recipe: identical to run_black_scholes.sh
# but with --ode-solver rk4 at a 5x coarser substep — measured BOTH ~27%
# faster and more accurate than the reference's euler-at-0.01 recipe
# (BENCH_NOTES.md solver study).  The reference recipes in run_*.sh remain
# euler for flag-for-flag parity.
set -euo pipefail
cd "$(dirname "$0")/.."
python experiments/experiment_black_scholes.py \
  --n-train 10000 --n-val 2000 \
  --hidden-dim 50 --shared-network \
  --dt-ode-step 0.05 --ode-solver rk4 \
  --n-epochs 200 --batch-size 128 \
  --moment-weights 1.0 10.0 \
  "$@"

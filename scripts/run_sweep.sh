#!/bin/bash
# Hyperparameter sweep: hidden_dim x n_hidden_layers grid.
# Equivalent of the reference's 9-task SLURM array job (run_array_job.sh)
# run sequentially on one TPU chip — each config is minutes, not hours.
# Usage: scripts/run_sweep.sh [extra experiment flags...]
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p logs
for hidden in 32 50 100; do
  for layers in 1 2 3; do
    echo "=== sweep: hidden_dim=$hidden n_hidden_layers=$layers ==="
    python -u experiments/experiment_black_scholes.py \
        --hidden-dim "$hidden" --n-hidden-layers "$layers" \
        --n-train 5000 --n-val 1000 --n-epochs 100 --batch-size 256 \
        --print-every 10 --no-plots "$@" \
        2>&1 | tee "logs/sweep_h${hidden}_l${layers}.log"
    mv runs/njode_black_scholes "runs/sweep_h${hidden}_l${layers}" || true
  done
done

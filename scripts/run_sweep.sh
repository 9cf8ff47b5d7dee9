#!/bin/bash
# Hyperparameter sweep: hidden_dim x n_hidden_layers grid.
# Equivalent of the reference's 9-task SLURM array job (run_array_job.sh),
# run CONCURRENTLY (SWEEP_JOBS at a time, default 3) — each config writes
# its own runs/sweep_h*_l* directory via --experiment-name, so jobs never
# collide.  Afterwards the results are aggregated into
# runs/sweep_results.{csv,png} (the aggregation step the reference's array
# job never had).
#
# Usage: scripts/run_sweep.sh [extra experiment flags...]
#   SWEEP_JOBS=N   concurrent configs (default 3; each holds its own copy
#                  of the training data in device memory — lower it if the
#                  chip runs out of HBM, raise it on CPU)
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p logs
JOBS="${SWEEP_JOBS:-3}"

run_one() {
  local hidden=$1 layers=$2; shift 2
  echo "=== sweep: hidden_dim=$hidden n_hidden_layers=$layers ==="
  python -u experiments/experiment_black_scholes.py \
      --hidden-dim "$hidden" --n-hidden-layers "$layers" \
      --experiment-name "sweep_h${hidden}_l${layers}" \
      --n-train 5000 --n-val 1000 --n-epochs 100 --batch-size 256 \
      --print-every 10 --no-plots "$@" \
      > "logs/sweep_h${hidden}_l${layers}.log" 2>&1
  echo "=== done: hidden_dim=$hidden n_hidden_layers=$layers ==="
}

# rolling pool: whenever JOBS configs are in flight, wait for ANY one to
# finish before launching the next (no batch barrier — a slow config never
# idles the other slots)
abort() {
  # stop the siblings still running, then reap them, before reporting
  local remaining
  remaining="$(jobs -rp)"
  [ -n "$remaining" ] && kill $remaining 2>/dev/null
  wait 2>/dev/null || true
  echo "sweep config failed (see logs/)"
  exit 1
}
for hidden in 32 50 100; do
  for layers in 1 2 3; do
    while [ "$(jobs -rp | wc -l)" -ge "$JOBS" ]; do
      wait -n || abort
    done
    run_one "$hidden" "$layers" "$@" &
  done
done
while [ "$(jobs -rp | wc -l)" -gt 0 ]; do
  wait -n || abort
done

python experiments/compare_experiments.py --sweep 'runs/sweep_h*_l*'

#!/bin/bash
# Scaled configuration (BASELINE.json config 5): 100k trajectories,
# obs_fraction=0.02, hidden_dim=256, fresh on-device generation per epoch —
# paths never leave HBM.  Shard over all local devices with --data-parallel.
# The fused whole-step kernel (--kernels step) + exact observation-time
# sampling are on by default here: measured fastest at this scale
# (7.5M traj/s vs 6.8M for the previous bfloat16 XLA recipe) with
# unchanged-or-better validation quality (BENCH_NOTES.md r3).  Matmuls run
# single-pass bf16 on the MXU either way (TPU default precision), so an
# explicit --compute-dtype bfloat16 only pays on the XLA path
# (--kernels off).
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p logs
python -u experiments/experiment_black_scholes.py \
    --n-train 100000 --n-val 5000 --n-epochs 100 --batch-size 4096 \
    --hidden-dim 256 --obs-fraction 0.02 --num-moments 2 \
    --kernels step --obs-only auto \
    --print-every 5 "$@" 2>&1 | tee "logs/scaled_sweep_$(date +%Y%m%d_%H%M%S).log"

#!/bin/bash
# Production Black-Scholes training on a TPU VM.
# TPU-native equivalent of the reference's SLURM batch script
# (reference run_black_scholes.sh): same model/data recipe, but one TPU chip
# replaces the 4-CPU/4h allocation — the whole 10k-trajectory run completes
# in minutes, and fresh paths are generated on-device every epoch.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p logs
python -u experiments/experiment_black_scholes.py \
    --n-train 10000 \
    --n-val 2000 \
    --n-epochs 200 \
    --batch-size 256 \
    --hidden-dim 50 \
    --learning-rate 0.001 \
    --num-moments 2 \
    --moment-weights 1.0 15.0 \
    --obs-fraction 0.1 \
    --dt-ode-step 0.01 \
    --shared-network \
    --print-every 5 \
    "$@" 2>&1 | tee "logs/njode_bs_$(date +%Y%m%d_%H%M%S).log"

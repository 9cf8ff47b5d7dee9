#!/bin/bash
# Production Ornstein-Uhlenbeck training (reference run_ou.sh equivalent).
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p logs
python -u experiments/experiment_ou.py \
    --n-train 10000 --n-val 2000 --n-epochs 200 --batch-size 256 \
    --hidden-dim 50 --learning-rate 0.001 --num-moments 2 \
    --moment-weights 1.0 15.0 --obs-fraction 0.1 --dt-ode-step 0.01 \
    --shared-network --print-every 5 \
    "$@" 2>&1 | tee "logs/njode_ou_$(date +%Y%m%d_%H%M%S).log"

#!/usr/bin/env bash
# A/B the scaled config (hidden 256) in f32 vs bf16 on the current backend.
set -u
cd "$(dirname "$0")/.."
echo "=== scaled f32 ==="
python bench.py --scaled --n-epochs 20
echo "=== scaled bf16 ==="
python bench.py --scaled --n-epochs 20 --compute-dtype bfloat16

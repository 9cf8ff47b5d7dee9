#!/bin/bash
# Round-5 close-out measurement sweep (run on a QUIET box, real TPU):
#   1. MFU triple: default / production / scaled recipes (verdict item 8's
#      BENCH_NOTES record).
#   2. Per-family default-recipe regression matrix (r2/r3 end-of-round
#      methodology).
#   3. Multi-dim rows: scaled d=2 (regression vs r5i) and the first
#      PRODUCTION d=2 row (composed per-gap XLA path — the walk family is
#      d_x=1 by measurement, BENCH_NOTES r5b/r5c).
# Each bench.py invocation prints ONE JSON line on stdout; everything else
# goes to stderr. Results accumulate in $OUT (one labeled line per row).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=${1:-/tmp/r5_closeout.jsonl}
: > "$OUT"

run() {
  local label="$1"; shift
  echo "=== $label: $*" >&2
  local line
  line=$(timeout 1800 python bench.py "$@" 2>>/tmp/r5_closeout.err)
  echo "{\"row\": \"$label\", \"bench\": $line}" >> "$OUT"
  echo "$label done: $line" >&2
}

# --- 1. MFU triple ---
run default
run production --dt-ode-step 0.01 --shared-network --hidden-dim 50 --n-train 10000
run scaled --scaled

# --- 2. per-family default-recipe regression ---
run ou      --process ornstein_uhlenbeck
run heston  --process heston
run hybrid  --process hybrid_ou_bs

# --- 3. multi-dim rows ---
run scaled_d2     --scaled --process black_scholes_nd --dims 2
run production_d2 --process black_scholes_nd --dims 2 --dt-ode-step 0.01 --shared-network --hidden-dim 50 --n-train 10000

echo ALL DONE >&2

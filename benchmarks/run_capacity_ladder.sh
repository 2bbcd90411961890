#!/bin/bash
# Capacity-axis quality ladder (round 3): is the flagship latent/width-bound?
#
# Sequential — ONE TPU client at a time (tunnel wedges otherwise, CLAUDE.md).
# Each run is bounded by `timeout` so a wedged tunnel can't eat the session;
# full_recipe.py --resume makes every run re-entrant, so rerunning this
# script after a crash continues where it stopped.
#
# All runs pin the 2048-corpus winning combo (enc 1e-3 / dec 1e-3 / cpx 0.1)
# so the axes compare at matched hyperparameters; the comparable metric is
# val_spectral (pure spectral on fixed val clips) via capacity_report.py.
set -u
cd "$(dirname "$0")/.."

run() {
  local out="$1" tmo="$2"; shift 2
  local log="/tmp/cap_$(basename "$out").log"
  if grep -qs '"stage": "done"' "$log" 2>/dev/null; then
    echo "SKIP $out (already done)"; return 0
  fi
  local resume=""
  [ -d "benchmarks/$out/checkpoints" ] && resume="--resume"
  echo "=== $(date -u +%H:%M:%S) START $out (timeout ${tmo}s) ==="
  timeout "$tmo" python benchmarks/full_recipe.py \
    --corpus 2048 --enc-lr 1e-3 --dec-lr 1e-3 --cpx 0.1 \
    --out "benchmarks/$out" $resume "$@" >> "$log" 2>&1
  echo "=== $(date -u +%H:%M:%S) END $out rc=$? ==="
}

run capacity_n20_c64  7200                # A: baseline (resumes from epoch 3)
run capacity_n20_c128 10800 --hidden 128  # B: width axis
run capacity_n20_c64_l9 9000 --layers 9   # D: depth axis (cheap)
echo "=== LADDER COMPLETE $(date -u +%H:%M:%S) ==="

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

# Record our own PID for the kill protocol (`setsid` may fork, so the
# launcher's $! is not reliably this shell). Refuse to double-start:
# two concurrent recipes corrupt the shared checkpoint dir AND the
# one-client TPU tunnel.
if [ -f /tmp/ladder.pid ] && kill -0 "$(cat /tmp/ladder.pid)" 2>/dev/null \
   && grep -qs run_capacity_ladder "/proc/$(cat /tmp/ladder.pid)/cmdline"; then
  # kill -0 alone would also match a recycled PID from an unrelated
  # process; require the cmdline to actually be this script.
  echo "ladder already running (pid $(cat /tmp/ladder.pid)); refusing to double-start"
  exit 1
fi
echo $$ > /tmp/ladder.pid
trap 'rm -f /tmp/ladder.pid' EXIT

# TPU hand-back deadline (UTC epoch): the driver's round-end bench.py must
# not collide with a live TPU client (round 2's BENCH rc=124 was exactly
# that). Runs are clamped to the time left and skipped entirely when
# under 10 minutes remain.
DEADLINE=${LADDER_DEADLINE:-$(date -u -d "2026-08-19 15:05" +%s)}

run() {
  local out="$1" tmo="$2"; shift 2
  local log="/tmp/cap_$(basename "$out").log"
  if grep -qs '"stage": "done"' "$log" 2>/dev/null; then
    echo "SKIP $out (already done)"; return 0
  fi
  local left=$(( DEADLINE - $(date -u +%s) ))
  [ "$tmo" -gt "$left" ] && tmo=$left
  if [ "$tmo" -lt 600 ]; then
    echo "SKIP $out (deadline: ${left}s left)"; return 0
  fi
  local resume=""
  [ -d "benchmarks/$out/checkpoints" ] && resume="--resume"
  echo "=== $(date -u +%H:%M:%S) START $out (timeout ${tmo}s) ==="
  timeout "$tmo" python benchmarks/full_recipe.py \
    --corpus 2048 --enc-lr 1e-3 --dec-lr 1e-3 --cpx 0.1 \
    --out "benchmarks/$out" $resume "$@" >> "$log" 2>&1
  echo "=== $(date -u +%H:%M:%S) END $out rc=$? ==="
}

run capacity_n20_c64  7200                # A: baseline (resumes)
run capacity_n20_c128 10800 --hidden 128  # B: width axis
# Latent-capacity probe at n=32 (the axis a full quality run is too slow
# for): can the 41,448-simplex hierarchy memorize a batch as well as n=20?
if [ $(( DEADLINE - $(date -u +%s) )) -ge 1800 ]; then
  echo "=== $(date -u +%H:%M:%S) START overfit probe n=32 ==="
  timeout 1700 python benchmarks/overfit_probe.py --vertices 32 \
    --steps 2000 --scan 100 >> /tmp/cap_probe_n32.log 2>&1
  echo "=== $(date -u +%H:%M:%S) END probe rc=$? ==="
fi
run capacity_n20_c64_l9 9000 --layers 9   # D: depth axis (if time allows)
echo "=== LADDER COMPLETE $(date -u +%H:%M:%S) ==="

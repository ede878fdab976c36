#!/bin/bash
# Staged hardware session for when the axon tunnel is available: validate
# the production Pallas kernels (ops/pallas/{trilinear,siren_trunk}.py)
# on-chip, sanity-run each family, then capture the full scoreboard,
# logging everything to /tmp/hw_session.log.
#
# Every stage is its own timeout-bounded process (a wedged Mosaic
# remote-compile killed the tunnel endpoint once in round 3 — ROADMAP.md);
# a dead stage leaves the rest of the list runnable after recovery.
# Usage: bash tools/hw_session.sh
#
# History (round 5): the original stage list validated the two then-pending
# kernels (fused AdaIN epilogue, fused ResNet block). All four correctness
# stages PASSED on the chip, but both kernels REGRESSED their e2e A/B
# (hologan 17.54 vs 15.24 ms/superstep; r1 34.02 vs 18.87) and were
# deleted — measurement record in BASELINE.md "kernel verdicts".
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/hw_session.log
run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ===" | tee -a "$LOG"
  timeout "$t" "$@" 2>&1 | tail -5 | tee -a "$LOG"
  # the stage's exit code, not tee's (124 = timed out / wedged compile)
  local rc=${PIPESTATUS[0]}
  echo "--- rc=$rc ---" | tee -a "$LOG"
}

# stage 1: kernel micro-validation (compile + fwd/bwd parity on-chip).
# Mosaic remote compiles through the tunnel can take minutes cold.
run trilinear_tiny 600 python tools/validate_kernels_hw.py trilinear_tiny
run trilinear_full 900 python tools/validate_kernels_hw.py trilinear_full
run siren_tiny     600 python tools/validate_kernels_hw.py siren_tiny
run siren_full     900 python tools/validate_kernels_hw.py siren_full

# stage 2: per-family single-chip sanity (tunnel variance ±15-30% — prefer
# the device_ms_per_superstep field over the e2e value)
run hologan_sanity 900 env BENCH_EXPT=hologan python bench.py
run pigan_sanity   900 env BENCH_EXPT=pigan BENCH_BATCH=32 python bench.py

# stage 3: the full driver scoreboard (all 7 families + fid_eval row with
# device_ms/mfu) — the BENCH_r05 content. Generous timeout: folded
# megastep cold compiles through the tunnel run 5-15 min per family.
run scoreboard 7200 python bench.py
run fid_eval   1800 env BENCH_FID=1 python bench.py
echo "hw_session done; full log: $LOG"

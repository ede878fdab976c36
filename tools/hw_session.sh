#!/bin/bash
# Staged hardware session for when the axon tunnel is available: validate
# the two pending Pallas kernels (ops/pallas/{adain,resnet_block}.py), then
# A/B their e2e effect, logging everything to /tmp/hw_session.log.
#
# Every stage is its own timeout-bounded process (a wedged Mosaic
# remote-compile killed the tunnel endpoint once this round — ROADMAP.md);
# a dead stage leaves the rest of the list runnable after recovery.
# Usage: bash tools/hw_session.sh [start_stage]   (default: run all)
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

# stage 1: kernel micro-validation (compile + fwd/bwd parity on-chip)
# timeouts: measured r5 on the live chip — adain compiles in <60 s, the
# resnet Mosaic compile needs 7-15 min through the tunnel (the r5 420 s
# budget produced a false timeout; the same stage passed at ~13 min)
run adain_tiny  300 python tools/validate_kernels_hw.py adain_tiny
run adain_full  300 python tools/validate_kernels_hw.py adain_full
run resnet_tiny 1200 python tools/validate_kernels_hw.py resnet_tiny
run resnet_full 1500 python tools/validate_kernels_hw.py resnet_full

# stage 2: e2e A/B (plain first = also revalidates the default path after
# the kernel-sharding refactor; tunnel variance ±15-30% — prefer the
# device_ms_per_superstep field over the e2e value)
run hologan_plain 900 env BENCH_EXPT=hologan python bench.py
run hologan_fused 900 env BENCH_EXPT=hologan \
    BENCH_EXTRA="generator.fused_adain=always discriminator.fused_norm=always" \
    python bench.py
run r1_plain 900 env BENCH_EXPT=gan_stability_r1 python bench.py
run r1_fused 1200 env BENCH_EXPT=gan_stability_r1 \
    BENCH_EXTRA="generator.fuse=always discriminator.fuse=always" \
    python bench.py

# stage 3: single-chip sanity for the other kernel families after the
# batch_partitioned gate (pigan exercises siren_trunk, hologan trilinear
# already covered above)
run pigan_sanity 900 env BENCH_EXPT=pigan BENCH_BATCH=32 python bench.py

# stage 4: the full driver scoreboard (all 7 families + fid_eval row with
# device_ms/mfu) — the BENCH_r04 content. Generous timeout: folded
# megastep cold compiles through the tunnel run 5-15 min per family.
run scoreboard 7200 python bench.py
run fid_eval   1800 env BENCH_FID=1 python bench.py
echo "hw_session done; full log: $LOG"

#!/bin/bash
# Round-3 battery part 5 (2026-08-19 session, chip restored again).
# Runs the three remaining lever benches from parts 3/4 that the tunnel
# drop killed, in shippability order. Log appended to the committed
# measurement log.
cd /root/repo || exit 1
LOG=experiments/r3_measure.log

stage() {
  name=$1; shift
  echo "=== STAGE $name $(date -u +%F' '%T) ===" >> "$LOG"
  timeout 2400 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $(date -u +%T)" >> "$LOG"
}

# 1. + Gmain differentiated bf16 render (halves the remaining Gmain stream
#    bandwidth; round-4 shippability candidate — measure now)
stage bench_b16_gdbf16 env TDGP_DMAIN_BF16=1 TDGP_GMAIN_BF16=1 python bench.py --single 16 none
# 2. batch-24 ladder rung at shipped defaults
stage bench_b24 python bench.py --single 24 none
# 3. fake reuse (opt-in; deletes one of the two renders per step)
stage bench_b16_reuse env TDGP_REUSE_FAKES=1 python bench.py --single 16 none

echo "=== BATTERY5 DONE $(date -u +%F' '%T) ===" >> "$LOG"

#!/bin/bash
# Round-5 mid-campaign battery: runs in the gap between flagship leg 1
# (4h timeout) and leg 2. Decides whether leg 2 resumes with the merged
# coarse+fine backward splat (generator.merged_splat).
#   1. on-chip splat parity gate (incl. the merged-pair aliased path)
#   2. bench rung b16 with merged_splat (alias mode)
# Keep this SHORT — every minute here is a minute leg 2 doesn't train.
cd /root/repo || exit 1
LOG=experiments/r5_battery.log
stamp() { echo "=== $* $(date -u +%F' '%T) ===" >> "$LOG"; }

stamp "GAP STAGE 1: onchip splat parity (incl. merged pair)"
timeout 1800 python scripts/testing/onchip_splat_parity.py >> "$LOG" 2>&1
echo "--- rc=$? $(date -u +%T)" >> "$LOG"

stamp "GAP STAGE 2: bench b16 merged_splat=alias"
TDGP_MERGED_SPLAT=1 timeout 3000 python bench.py --single 16 none >> "$LOG" 2>&1
echo "--- rc=$? $(date -u +%T)" >> "$LOG"
stamp "GAP BATTERY DONE"

#!/bin/bash
# Round-5 on-chip battery: runs AFTER the flagship frees the chip.
#   1. on-chip splat parity gate (now incl. the merged-pair aliased path)
#   2. bench rung b16 with the merged coarse+fine backward splat (alias mode)
#   3. merged splat, concat mode (single sort over both passes; may OOM)
#   4. b24 with r1_remat (the grad-of-grad peak fix; any speed = success)
# Each stage is an independent process (OOM fragmentation isolation).
cd /root/repo || exit 1
LOG=experiments/r5_battery.log
stamp() { echo "=== $* $(date -u +%F' '%T) ===" >> "$LOG"; }

stamp "STAGE 1: onchip splat parity (incl. merged pair + overlap windows)"
timeout 1800 python scripts/testing/onchip_splat_parity.py >> "$LOG" 2>&1
echo "--- rc=$? $(date -u +%T)" >> "$LOG"

stamp "STAGE 1b: overlap-window splat sweep (e2e prod bf16, wrows 2/4/8)"
timeout 1800 python scripts/testing/profile_splat_overlap.py >> "$LOG" 2>&1
echo "--- rc=$? $(date -u +%T)" >> "$LOG"

stamp "STAGE 2: bench b16 merged_splat=alias"
TDGP_MERGED_SPLAT=1 TDGP_SPLAT_PAIR_MODE=alias \
  timeout 3000 python bench.py --single 16 none >> "$LOG" 2>&1
echo "--- rc=$? $(date -u +%T)" >> "$LOG"

stamp "STAGE 3: bench b16 merged_splat=concat"
TDGP_MERGED_SPLAT=1 TDGP_SPLAT_PAIR_MODE=concat \
  timeout 3000 python bench.py --single 16 none >> "$LOG" 2>&1
echo "--- rc=$? $(date -u +%T)" >> "$LOG"

stamp "STAGE 4: bench b24 r1_remat (OOM probe; success = it runs at all)"
TDGP_R1_REMAT=1 timeout 3000 python bench.py --single 24 8 >> "$LOG" 2>&1
echo "--- rc=$? $(date -u +%T)" >> "$LOG"

stamp "R5 BATTERY DONE"

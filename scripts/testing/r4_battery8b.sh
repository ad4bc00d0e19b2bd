#!/bin/bash
# Battery8 resume #2 — the 06:20 relaunch of battery8 ran in the builder
# session's foreground and died with that session ~06:36+ during the
# bench_b16_reuse stage (see rc=killed markers in the log). This script
# re-runs the four remaining stages, detached this time.
cd /root/repo || exit 1
LOG=experiments/r4_measure.log

stage() {
  name=$1; shift
  echo "=== STAGE $name $(date -u +%F' '%T) ===" >> "$LOG"
  timeout 2400 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $(date -u +%T)" >> "$LOG"
}

stage bench_b16_reuse   env TDGP_REUSE_FAKES=1 python bench.py --single 16 none
stage bench_b24_bg8     python bench.py --single 24 8
stage bench_b32_bg8     python bench.py --single 32 8
stage bench_b24_bg8_reuse env TDGP_REUSE_FAKES=1 python bench.py --single 24 8

echo "=== BATTERY8 DONE $(date -u +%F' '%T) ===" >> "$LOG"

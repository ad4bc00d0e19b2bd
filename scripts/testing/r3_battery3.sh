#!/bin/bash
# Round-3 battery part 3 (chip back up 2026-08-18 14:10 UTC).
# Remaining lever benches in shippability order; log appended to the
# committed measurement log.
cd /root/repo || exit 1
LOG=experiments/r3_measure.log

stage() {
  name=$1; shift
  echo "=== STAGE $name $(date -u +%F' '%T) ===" >> "$LOG"
  timeout 2400 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $(date -u +%T)" >> "$LOG"
}

# 1. Dmain bf16 fake render — the one lever shippable as default this round
stage bench_b16_dmainbf16 env TDGP_DMAIN_BF16=1 python bench.py --single 16 none
# 2. + Gmain differentiated bf16 render (round-4 candidate, measure now)
stage bench_b16_gdbf16 env TDGP_DMAIN_BF16=1 TDGP_GMAIN_BF16=1 python bench.py --single 16 none
# 3. fake reuse (opt-in; replaces the Dmain render entirely)
stage bench_b16_reuse env TDGP_REUSE_FAKES=1 python bench.py --single 16 none

echo "=== BATTERY3 DONE $(date -u +%F' '%T) ===" >> "$LOG"

#!/bin/bash
# Round-3 battery part 4: waits for the in-flight dmain_bf16 bench (part-3
# stage 1), then runs the two highest-value remaining stages:
#   2. +gmain bf16 differentiated render (round-4 candidate measurement)
#   3. batch-24 ladder rung at shipped defaults (can raise the bench ladder)
cd /root/repo || exit 1
LOG=experiments/r3_measure.log

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 15; done
  echo "--- (part-3 stage 1 finished, part 4 takes over) $(date -u +%T)" >> "$LOG"
fi

stage() {
  name=$1; shift
  echo "=== STAGE $name $(date -u +%F' '%T) ===" >> "$LOG"
  timeout 2400 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $(date -u +%T)" >> "$LOG"
}

stage bench_b16_gdbf16 env TDGP_DMAIN_BF16=1 TDGP_GMAIN_BF16=1 python bench.py --single 16 none
stage bench_b24 python bench.py --single 24 none

echo "=== BATTERY4 DONE $(date -u +%F' '%T) ===" >> "$LOG"

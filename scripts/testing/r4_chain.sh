#!/bin/bash
# Round-4 chip chain: keeps the single TPU busy across builder-session
# deaths (round 3 lost hours to tunnel/session kills). Order:
#   1. wait for battery8 (launched separately) to finish its ladder
#   2. A/B dynamics battery (reuse-fakes FID-neutrality, 60 kimg x2)
#   3. flagship synth256 run, two legs with a mid-run --run-dir resume
#   4. extend the A/B control run past 200 kimg (the committed round-3
#      64^2 run can't be extended: only snapshot *meta* was committed,
#      the orbax weights died with the round-3 VM) — tail-trend evidence
#      for the fid-proxy uptick question (VERDICT r3 weak-5).
# Each phase double-checks a marker so a rerun of this script skips
# completed phases.
cd /root/repo || exit 1
MLOG=experiments/r4_measure.log

while ! grep -q "BATTERY8 DONE" "$MLOG" 2>/dev/null; do sleep 60; done

if ! grep -q "AB BATTERY DONE" experiments/r4_ab.log 2>/dev/null; then
  KIMG=60 bash scripts/testing/r4_ab_dynamics.sh
fi

if ! grep -q "FLAGSHIP DONE" experiments/r4_flagship.log 2>/dev/null; then
  bash scripts/testing/r4_flagship.sh
fi

CONTROL=$(ls -d experiments/*r4-ab-control* 2>/dev/null | tail -1)
if [ -n "$CONTROL" ] && ! grep -q "EXTEND DONE" experiments/r4_ab.log 2>/dev/null; then
  echo "=== EXTEND control -> 210 kimg $(date -u +%F' '%T) ===" >> experiments/r4_ab.log
  timeout 14400 python scripts/train.py --run-dir "$CONTROL" --max-kimg 210 \
    >> experiments/r4_ab.log 2>&1
  echo "=== EXTEND DONE rc=$? $(date -u +%F' '%T) ===" >> experiments/r4_ab.log
fi
echo "=== CHAIN DONE $(date -u +%F' '%T) ===" >> "$MLOG"

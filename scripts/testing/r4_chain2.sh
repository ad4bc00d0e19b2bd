#!/bin/bash
# Round-4 chip chain v2 (supersedes r4_chain.sh): adds an on-chip profile
# stage for the reuse-fakes step between battery8 and the A/B battery, and
# a battery9 hook so later-armed perf levers run without editing a live
# script. Keeps the single TPU busy across builder-session deaths.
# Order:
#   1. wait for battery8 (detached; r4_battery8b.sh) to finish its ladder
#   2. profile the reuse step + splat prep at b16 rows (next-lever data)
#   3. A/B dynamics battery (reuse-fakes FID-neutrality, 60 kimg x2)
#   4. battery9 hook: run scripts/testing/r4_battery9.sh if it exists
#   5. flagship synth256 run, two legs with a mid-run --run-dir resume
#   6. extend the A/B control run past 200 kimg (round-3 64^2 run's orbax
#      weights died with the round-3 VM; this is the tail-trend evidence
#      for VERDICT r3 weak-5)
# Each phase checks a marker so a rerun skips completed phases.
cd /root/repo || exit 1
MLOG=experiments/r4_measure.log

while ! grep -q "BATTERY8 DONE" "$MLOG" 2>/dev/null; do sleep 60; done

if ! grep -q "PROFILE REUSE DONE" "$MLOG" 2>/dev/null; then
  echo "=== STAGE profile_reuse_phases $(date -u +%F' '%T) ===" >> "$MLOG"
  timeout 2400 env N=16 python scripts/testing/profile_reuse_phases.py >> "$MLOG" 2>&1
  echo "--- rc=$? $(date -u +%T)" >> "$MLOG"
  echo "=== STAGE profile_splat_prep_b16 $(date -u +%F' '%T) ===" >> "$MLOG"
  timeout 2400 env N=16 python scripts/testing/profile_splat_prep.py >> "$MLOG" 2>&1
  echo "--- rc=$? $(date -u +%T)" >> "$MLOG"
  echo "=== PROFILE REUSE DONE $(date -u +%F' '%T) ===" >> "$MLOG"
fi

if ! grep -q "AB BATTERY DONE" experiments/r4_ab.log 2>/dev/null; then
  KIMG=60 bash scripts/testing/r4_ab_dynamics.sh
fi

if [ -f scripts/testing/r4_battery9.sh ] \
    && ! grep -q "BATTERY9 DONE" "$MLOG" 2>/dev/null; then
  bash scripts/testing/r4_battery9.sh
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

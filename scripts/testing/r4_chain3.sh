#!/bin/bash
# Round-4 chip chain v3 (supersedes r4_chain2.sh, whose wrapper was killed
# after battery9 started so a fixed fwd-decomp probe could be inserted
# before the flagship; battery9 itself keeps running to completion).
# Order:
#   1. wait for battery9 (already running detached) to finish
#   2. battery10: the fixed profile_fwd_decomp at b8 (the b16 variant OOMed
#      on probe-side duplicate buffers, not a model-path issue)
#   3. flagship synth256 run, two legs with a mid-run --run-dir resume
#      (picks up the round-4 default: dmain_reuse_fakes=true)
#   4. extend the A/B control run past 200 kimg (frozen config keeps the
#      control's reuse=false semantics on resume)
cd /root/repo || exit 1
MLOG=experiments/r4_measure.log

while ! grep -q "BATTERY9 DONE" "$MLOG" 2>/dev/null; do sleep 60; done

if ! grep -q "BATTERY10 DONE" "$MLOG" 2>/dev/null; then
  echo "=== STAGE profile_fwd_decomp_b8 $(date -u +%F' '%T) ===" >> "$MLOG"
  timeout 2400 env N=8 python scripts/testing/profile_fwd_decomp.py >> "$MLOG" 2>&1
  echo "--- rc=$? $(date -u +%T)" >> "$MLOG"
  echo "=== BATTERY10 DONE $(date -u +%F' '%T) ===" >> "$MLOG"
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

#!/bin/bash
# Round-4 chain v5 (supersedes chain4). The flagship needs a third attempt:
# legs 1-2 both died at the FIRST in-loop fid2k eval (the 256^2 eval
# compile crashes the axon compile service) and the pre-fix loop lost the
# snapshot both times. The loop now (a) saves the snapshot BEFORE the eval
# and (b) contains metric-eval failures (warn + disable, offline FID).
# Order:
#   1. wait for chain3's extend stage (CHAIN DONE marker)
#   2. flagship-b: synth256, two legs with a mid-run --run-dir resume
#      (30 kimg then -> 60 kimg), new code
#   3. offline fid2k_full per flagship snapshot (fresh process per eval —
#      clean compile service, no resident training programs)
#   4. battery11: table_bf16 dynamics A/B leg (40 kimg) + nfs256 on the
#      flagship + the shipped-defaults bench
cd /root/repo || exit 1
MLOG=experiments/r4_measure.log
FLOG=experiments/r4_flagship.log

while ! grep -q "CHAIN DONE" "$MLOG" 2>/dev/null; do sleep 60; done

if ! grep -q "FLAGSHIPB DONE" "$FLOG" 2>/dev/null; then
  echo "=== FLAGSHIPB LEG1 (to 30 kimg) $(date -u +%F' '%T) ===" >> "$FLOG"
  timeout 7200 python scripts/train.py --preset synth256 --desc r4-flagship-b \
    --max-kimg 30 --run-root experiments >> "$FLOG" 2>&1
  echo "--- rc=$? $(date -u +%T)" >> "$FLOG"
  RUN=$(ls -d experiments/*r4-flagship-b* 2>/dev/null | tail -1)
  if [ -n "$RUN" ]; then
    echo "=== FLAGSHIPB LEG2 (resume $RUN -> 60 kimg) $(date -u +%F' '%T) ===" >> "$FLOG"
    timeout 7200 python scripts/train.py --run-dir "$RUN" --max-kimg 60 >> "$FLOG" 2>&1
    echo "--- rc=$? $(date -u +%T)" >> "$FLOG"
  fi
  echo "=== FLAGSHIPB DONE $(date -u +%F' '%T) ===" >> "$FLOG"
fi

RUN=$(ls -d experiments/*r4-flagship-b* 2>/dev/null | tail -1)
if [ -n "$RUN" ] && ! grep -q "OFFLINE FID DONE" "$FLOG" 2>/dev/null; then
  for snap in "$RUN"/network-snapshot-*/; do
    s=${snap%/}
    echo "=== OFFLINE FID $s $(date -u +%F' '%T) ===" >> "$FLOG"
    timeout 1800 python scripts/calc_metrics.py --run-dir "$RUN" \
      --snapshot "$s" --metrics fid2k_full >> "$FLOG" 2>&1
    echo "--- rc=$? $(date -u +%T)" >> "$FLOG"
  done
  echo "=== OFFLINE FID DONE $(date -u +%F' '%T) ===" >> "$FLOG"
fi

if ! grep -q "BATTERY11 DONE" "$MLOG" 2>/dev/null; then
  KIMG=40 bash scripts/testing/r4_battery11.sh
fi
echo "=== CHAIN5 DONE $(date -u +%F' '%T) ===" >> "$MLOG"

#!/bin/bash
# Waits for chain3 (flagship + extend) to finish, then runs battery11
# (table_bf16 dynamics A/B leg + nfs256 on the flagship + a shipped-
# defaults bench). If the flagship ended short of ~90 kimg (compile-
# service flakes cost leg1 its first 10 kimg) and wall-clock allows,
# tops it up with one more bounded resume leg — the chip must be FREE
# well before round end for the driver's bench.
cd /root/repo || exit 1
MLOG=experiments/r4_measure.log
while ! grep -q "CHAIN DONE" "$MLOG" 2>/dev/null; do sleep 120; done

if ! grep -q "BATTERY11 DONE" "$MLOG" 2>/dev/null; then
  bash scripts/testing/r4_battery11.sh
fi

FLAG=$(ls -d experiments/*r4-flagship* 2>/dev/null | tail -1)
if [ -n "$FLAG" ] && [ "$(date -u +%H%M)" -lt 2015 ]; then
  LAST=$(ls "$FLAG" | grep -o 'network-snapshot-[0-9]*$' | sort | tail -1 | grep -o '[0-9]*$')
  if [ -n "$LAST" ] && [ "$((10#$LAST))" -lt 90 ]; then
    echo "=== FLAGSHIP TOPUP (from ${LAST} kimg) $(date -u +%F' '%T) ===" >> experiments/r4_flagship.log
    timeout 4500 python scripts/train.py --run-dir "$FLAG" --max-kimg 100 \
      >> experiments/r4_flagship.log 2>&1
    echo "--- rc=$? $(date -u +%T)" >> experiments/r4_flagship.log
  fi
fi
echo "=== CHAIN4 DONE $(date -u +%F' '%T) ===" >> "$MLOG"

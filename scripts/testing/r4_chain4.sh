#!/bin/bash
# Waits for chain3 (flagship + extend) to finish, then runs battery11
# (table_bf16 dynamics A/B leg + a shipped-defaults bench).
cd /root/repo || exit 1
MLOG=experiments/r4_measure.log
while ! grep -q "CHAIN DONE" "$MLOG" 2>/dev/null; do sleep 120; done
if ! grep -q "BATTERY11 DONE" "$MLOG" 2>/dev/null; then
  bash scripts/testing/r4_battery11.sh
fi

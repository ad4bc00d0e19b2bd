#!/bin/bash
# Round-3 flagship-shape dynamics run: synth256 preset (satellite widths,
# 64^2 patches @256^2, ADA + compressed anneals) — VERDICT r3 item 6.
# Chains after battery part 2 (one chip). Artifacts land in experiments/
# (fakes grids, stats.jsonl, metric jsonls, snapshot meta) for commit.
cd /root/repo || exit 1

if [ -f /tmp/battery2.pid ]; then
  while kill -0 "$(cat /tmp/battery2.pid)" 2>/dev/null; do sleep 30; done
fi

echo "=== FLAGSHIP START $(date -u +%F' '%T) ===" >> experiments/r3_measure.log
timeout 14400 python scripts/train.py --preset synth256 --desc r3-flagship \
  --max-kimg 60 > /tmp/flagship_run.log 2>&1
echo "=== FLAGSHIP rc=$? $(date -u +%F' '%T) ===" >> experiments/r3_measure.log

#!/bin/bash
# Round-3 battery part 2: waits for part 1 (pid file), then re-runs the two
# stages that crashed in the splat.py edit window + benches the new
# gmain_render_bf16 lever. Combo/b24 stages are appended manually once the
# part-1 numbers are in.
cd /root/repo || exit 1
LOG=experiments/r3_measure.log

if [ -f /tmp/battery.pid ]; then
  while kill -0 "$(cat /tmp/battery.pid)" 2>/dev/null; do sleep 20; done
fi

stage() {
  name=$1; shift
  echo "=== STAGE $name $(date -u +%F' '%T) ===" >> "$LOG"
  timeout 2400 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $(date -u +%T)" >> "$LOG"
}

stage splat_wrows8_rerun env TDGP_SPLAT_WROWS=8 python scripts/testing/profile_splat.py
stage splat_table_bf16_rerun env TDGP_SPLAT_TABLE=bf16 python scripts/testing/profile_splat.py
stage bench_b16_gmainbf16 env TDGP_GMAIN_BF16=1 python bench.py --single 16 none

echo "=== BATTERY2 DONE $(date -u +%F' '%T) ===" >> "$LOG"

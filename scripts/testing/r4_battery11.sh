#!/bin/bash
# Round-4 battery 11 — runs after the chain (flagship + extend) frees the
# chip:
#   1. table_bf16 dynamics A/B leg: one synth64 60-kimg run with
#      TDGP_SPLAT_TABLE=bf16 on top of the shipped defaults (reuse on).
#      CONTROL = the committed r4-ab-reuse leg (identical seed/preset/
#      data, table fp32). synth64's 128^2 planes take the fused path, so
#      the bf16 window-table write (the quantization under test) is
#      exercised. If clean -> flip the default next round for the
#      measured +2.2% (9.97 imgs/s).
#   2. shipped-defaults bench at the ladder head — pre-verifies the
#      BENCH_r04 number and warms the compile cache for the driver's run.
cd /root/repo || exit 1
LOG=experiments/r4_measure.log

# hard wall-clock guard: the driver benches on this chip at round end —
# do not start a new multi-stage battery late into the evening (UTC)
if [ "$(date -u +%H%M)" -gt 2045 ]; then
  echo "=== BATTERY11 SKIPPED (too late: $(date -u +%H%M) UTC) ===" >> "$LOG"
  echo "=== BATTERY11 DONE $(date -u +%F' '%T) ===" >> "$LOG"
  exit 0
fi

stage() {
  name=$1; shift
  echo "=== STAGE $name $(date -u +%F' '%T) ===" >> "$LOG"
  timeout 4800 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $(date -u +%T)" >> "$LOG"
}

KIMG=${KIMG:-60}
stage ab_tablebf16 env TDGP_SPLAT_TABLE=bf16 \
  python scripts/train.py --preset synth64 --desc r4-ab-tablebf16 \
  --max-kimg "$KIMG" --run-root experiments dataset.path=data/synth64 \
  dataset.mirror=true

REUSE=$(ls -d experiments/*r4-ab-reuse* 2>/dev/null | tail -1)
TBF=$(ls -d experiments/*r4-ab-tablebf16* 2>/dev/null | tail -1)
if [ -n "$REUSE" ] && [ -n "$TBF" ]; then
  echo "=== COMPARE reuse(table fp32) vs tablebf16 ===" >> "$LOG"
  python scripts/testing/compare_runs.py "$REUSE" "$TBF" >> "$LOG" 2>&1
fi

# the reference's second in-loop metric (nfs256, configs/training/
# base.yaml:20) on the flagship run's latest snapshot — the synth presets
# track only fid2k in-loop, so compute NFS offline like calc_metrics.py
FLAG=$(ls -d experiments/*r4-flagship* 2>/dev/null | tail -1)
if [ -n "$FLAG" ]; then
  stage nfs256_flagship python scripts/calc_metrics.py --run-dir "$FLAG" \
    --snapshot latest --metrics nfs256
fi

stage bench_defaults_b16 python bench.py --single 16 none

echo "=== BATTERY11 DONE $(date -u +%F' '%T) ===" >> "$LOG"

#!/bin/bash
# Round-4 battery 12 — the table_bf16 dynamics A/B that battery11's
# wall-clock guard skipped last session. Fresh checkout lost data/, so
# regenerate the seeded synth64 set first (make_synthetic_dataset.py is
# RandomState(0)-seeded -> byte-identical to the control run's data).
# CONTROL = the committed r4-ab-reuse leg (shipped defaults, table fp32,
# fid2k_full 51.79 @ 60 kimg). If the bf16 window-table curve tracks it,
# flip generator table_bf16 default for the measured +2.2% (9.97 imgs/s).
cd /root/repo || exit 1
LOG=experiments/r4_measure.log

stage() {
  name=$1; shift
  echo "=== STAGE $name $(date -u +%F' '%T) ===" >> "$LOG"
  timeout 4800 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $(date -u +%T)" >> "$LOG"
}

if [ ! -d data/synth64 ]; then
  echo "=== REGEN data/synth64 $(date -u +%F' '%T) ===" >> "$LOG"
  python data_scripts/make_synthetic_dataset.py --out data/synth64 \
    --n 4000 --res 64 --classes 4 >> "$LOG" 2>&1
fi

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
echo "=== BATTERY12 DONE $(date -u +%F' '%T) ===" >> "$LOG"

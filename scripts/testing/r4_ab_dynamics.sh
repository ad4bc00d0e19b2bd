#!/bin/bash
# Round-4 A/B dynamics battery: FID-proxy neutrality evidence for
# training.dmain_reuse_fakes before it can become a default operating point
# (DESIGN.md ledger protocol; reuse-fakes deferral).
#
# gmain_render_bf16 was struck from this battery: battery part 5 measured
# it perf-NEUTRAL (+0.3% over dmain_bf16 alone — the step is row-bound),
# so its numerics risk buys nothing and it will never ship as default.
#
# Two synth64 runs from the same seed, then trend comparison via
# scripts/testing/compare_runs.py. ~KIMG kimg each; tune to the chip window.
cd /root/repo || exit 1
LOG=experiments/r4_ab.log
KIMG=${KIMG:-40}
ROOT=experiments

stage() {
  name=$1; shift
  echo "=== STAGE $name $(date -u +%F' '%T) ===" >> "$LOG"
  timeout 7200 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $(date -u +%T)" >> "$LOG"
}

if [ ! -d data/synth64 ]; then
  python data_scripts/make_synthetic_dataset.py --out data/synth64 \
    --n 4000 --res 64 --classes 4 >> "$LOG" 2>&1
fi

# explicit reuse=false: the flag defaulted ON after this battery's verdict
# landed (commit 689a61f) — without the pin a rerun would compare reuse vs
# reuse and "confirm" neutrality vacuously
stage ab_control  python scripts/train.py --preset synth64 --desc r4-ab-control \
  --max-kimg "$KIMG" --run-root "$ROOT" dataset.path=data/synth64 dataset.mirror=true \
  training.dmain_reuse_fakes=false
stage ab_reuse    python scripts/train.py --preset synth64 --desc r4-ab-reuse \
  --max-kimg "$KIMG" --run-root "$ROOT" dataset.path=data/synth64 dataset.mirror=true \
  training.dmain_reuse_fakes=true

CONTROL=$(ls -d "$ROOT"/*r4-ab-control* 2>/dev/null | tail -1)
for v in reuse; do
  RUN=$(ls -d "$ROOT"/*r4-ab-$v* 2>/dev/null | tail -1)
  if [ -n "$CONTROL" ] && [ -n "$RUN" ]; then
    echo "=== COMPARE control vs $v ===" >> "$LOG"
    python scripts/testing/compare_runs.py "$CONTROL" "$RUN" >> "$LOG" 2>&1
  fi
done
echo "=== AB BATTERY DONE $(date -u +%F' '%T) ===" >> "$LOG"

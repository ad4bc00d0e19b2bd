#!/bin/bash
# Flagship leg 2: resume the r5 run to KIMG2, optionally with the merged
# coarse+fine backward splat (decided by the gap battery), then export the
# EMA and run offline FID on the final snapshot. Usage:
#   MERGED=1 KIMG2=200 LEG2_TIMEOUT=14000 bash scripts/testing/r5_leg2.sh
cd /root/repo || exit 1
LOG=experiments/r5_flagship.log
RUN=experiments/synth256-3dgp-p64-b16-8839f23-r5-flagship
KIMG2=${KIMG2:-200}
stamp() { echo "=== $* $(date -u +%F' '%T) ===" >> "$LOG"; }

if ! ls -d "$RUN"/network-snapshot-* >/dev/null 2>&1; then
  stamp "LEG2: no snapshot in $RUN - ABORT"; exit 1
fi

stamp "EXPORT EMA (leg1 latest) run=$RUN"
python scripts/infra/export_ema.py --run-dir "$RUN" --snapshot latest \
  --out "$RUN/g_ema_leg1.npz" >> "$LOG" 2>&1
echo "--- rc=$? $(date -u +%T)" >> "$LOG"

# val_freq 5 -> 15 ticks (every 30 kimg): the 256² in-loop fid2k costs
# ~800 s per eval (full-image renders) — every-10-kimg tracking was eating
# ~60% of the training rate; the reference tracks fid2k every 400 kimg
# (training/base.yaml val_freq=100 x tick 4 kimg), so 30 kimg is still 13x
# denser than the reference. merged_splat pinned EXPLICITLY to its
# launch-time value so a later default flip cannot silently change the
# mid-campaign program (losing the compile-cache hit).
OVR=("training.val_freq=15")
if [ -n "$MERGED" ]; then OVR+=("generator.merged_splat=true");
else OVR+=("generator.merged_splat=false"); fi
stamp "FLAGSHIP LEG2 (resume -> ${KIMG2} kimg; overrides: ${OVR[*]})"
timeout "${LEG2_TIMEOUT:-14400}" python scripts/train.py --run-dir "$RUN" \
  --max-kimg "$KIMG2" "${OVR[@]}" >> "$LOG" 2>&1
echo "--- rc=$? $(date -u +%T)" >> "$LOG"

stamp "EXPORT EMA (leg2 latest)"
python scripts/infra/export_ema.py --run-dir "$RUN" --snapshot latest \
  --out "$RUN/g_ema_leg2.npz" >> "$LOG" 2>&1
echo "--- rc=$? $(date -u +%T)" >> "$LOG"

SNAP=$(ls -d "$RUN"/network-snapshot-*/ 2>/dev/null | sort | tail -1)
if [ -n "$SNAP" ] && [ -z "$SKIP_FID" ]; then
  stamp "OFFLINE FID ($SNAP)"
  timeout 2400 python scripts/calc_metrics.py --run-dir "$RUN" \
    --snapshot "$SNAP" --metrics fid2k_full --batch-gpu 4 >> "$LOG" 2>&1
  echo "--- rc=$? $(date -u +%T)" >> "$LOG"
fi
stamp "R5 LEG2 DONE"

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

OVR=()
[ -n "$MERGED" ] && OVR+=("generator.merged_splat=true")
stamp "FLAGSHIP LEG2 (resume -> ${KIMG2} kimg; overrides: ${OVR[*]:-none})"
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

#!/bin/bash
# Round-5 flagship campaign chain (supersedes r5_night.sh): drive the run
# to 200 kimg through as many legs as the host-RSS watchdog needs
# (training.max_rss_gb snapshots + exits cleanly; each leg resumes from
# --run-dir), then export the final EMA, run offline FID, and spend the
# freed chip on the queued probes.
cd /root/repo || exit 1
LOG=experiments/r5_flagship.log
NLOG=experiments/r5_night.log
RUN=experiments/synth256-3dgp-p64-b16-8839f23-r5-flagship
TARGET=${TARGET:-200}
stamp() { echo "=== $* $(date -u +%F' '%T) ===" >> "$LOG"; }
nstamp() { echo "=== $* $(date -u +%F' '%T) ===" >> "$NLOG"; }

last_kimg() {
  ls -d "$RUN"/network-snapshot-* 2>/dev/null | grep -o '[0-9]*$' \
    | sort -n | tail -1 | sed 's/^0*//'
}

for attempt in 1 2 3 4 5; do
  LAST=$(last_kimg)
  [ -z "$LAST" ] && LAST=0
  if [ "$LAST" -ge "$TARGET" ]; then break; fi
  stamp "CAMPAIGN LEG (attempt $attempt: $LAST -> $TARGET kimg)"
  timeout "${LEG_TIMEOUT:-16000}" python scripts/train.py --run-dir "$RUN" \
    --max-kimg "$TARGET" training.val_freq=15 generator.merged_splat=true \
    >> "$LOG" 2>&1
  echo "--- rc=$? $(date -u +%T)" >> "$LOG"
done

stamp "EXPORT EMA (final, $(last_kimg) kimg)"
python scripts/infra/export_ema.py --run-dir "$RUN" --snapshot latest \
  --out "$RUN/g_ema_final.npz" >> "$LOG" 2>&1

SNAP=$(ls -d "$RUN"/network-snapshot-*/ 2>/dev/null | sort | tail -1)
if [ -n "$SNAP" ]; then
  stamp "OFFLINE FID (final $SNAP)"
  timeout 2400 python scripts/calc_metrics.py --run-dir "$RUN" \
    --snapshot "$SNAP" --metrics fid2k_full --batch-gpu 4 >> "$LOG" 2>&1
  echo "--- rc=$? $(date -u +%T)" >> "$LOG"
fi
stamp "R5 CAMPAIGN DONE"

# ---- probes on the freed chip (results in r5_night.log) ----
nstamp "PROBE: int8-take stacked bench (compile-time retry)"
TDGP_SPLAT_TAKE=i8 timeout 3000 python bench.py --single 16 none >> "$NLOG" 2>&1
echo "--- rc=$? $(date -u +%T)" >> "$NLOG"

# r1_batch_gpu must undercut the main micro: battery stage 4 ran R1 at
# micro 8 (batch_gpu=8) + r1_remat and still OOMed
nstamp "PROBE: b24 with r1_remat + r1_batch_gpu=4"
TDGP_R1_REMAT=1 TDGP_R1_BATCH_GPU=4 timeout 3000 \
  python bench.py --single 24 8 >> "$NLOG" 2>&1
echo "--- rc=$? $(date -u +%T)" >> "$NLOG"

nstamp "PROBE: ADA augment pipe cost (flagship shapes)"
timeout 1800 python scripts/testing/probe_augment_cost.py >> "$NLOG" 2>&1
echo "--- rc=$? $(date -u +%T)" >> "$NLOG"

nstamp "GATE: on-chip splat parity (alias+concat pair modes, overlap wr2/4)"
timeout 2400 python scripts/testing/onchip_splat_parity.py >> "$NLOG" 2>&1
echo "--- rc=$? $(date -u +%T)" >> "$NLOG"
nstamp "R5 NIGHT PROBES DONE"

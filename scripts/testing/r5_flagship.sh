#!/bin/bash
# Round-5 flagship chain (VERDICT r4 item 2): a 256^2 campaign that SURVIVES —
# per-leg EMA exports + metric jsonls + stats committed-able, legs chained via
# --run-dir resume. The r4 legs died at their first in-loop eval (remote-
# compile HTTP 500, now contained + micro-batched) and their orbax snapshots
# were never committed; this chain makes the artifact durable:
#   leg 1  -> KIMG1 (synth256 preset; in-loop eval micro-batched at
#             EvalContext.batch_gpu=4; snapshot-before-eval; re-armable
#             metric containment)
#   leg 2  -> resume via --run-dir to KIMG2 (the resume demo)
#   export -> EMA-only .npz per leg end (scripts/infra/export_ema.py,
#             ~1/6 of a full TrainState; small enough to commit, enough to
#             reload for offline FID / inference / serving export)
#   fid    -> offline fid2k_full on the final snapshot
# ADVICE r4 fixes: RUN picked by mtime (stale *r5-flagship* dirs from
# earlier attempts must not capture the resume), and each stage gates on
# leg 1 actually having produced a snapshot.
cd /root/repo || exit 1
LOG=experiments/r5_flagship.log
ROOT=experiments
KIMG1=${KIMG1:-100}
KIMG2=${KIMG2:-220}
DESC=${DESC:-r5-flagship}

stamp() { echo "=== $* $(date -u +%F' '%T) ===" >> "$LOG"; }

if [ ! -d data/synth256 ]; then
  stamp "REGEN data/synth256"
  python data_scripts/make_synthetic_dataset.py --out data/synth256 \
    --n 2000 --res 256 --classes 4 >> "$LOG" 2>&1
fi

stamp "FLAGSHIP LEG1 (to ${KIMG1} kimg)"
timeout "${LEG1_TIMEOUT:-14400}" python scripts/train.py --preset synth256 \
  --desc "$DESC" --max-kimg "$KIMG1" --run-root "$ROOT" >> "$LOG" 2>&1
echo "--- rc=$? $(date -u +%T)" >> "$LOG"

# newest matching dir, not lexicographically last (stale dirs embed old
# git hashes and can sort after the fresh one)
RUN=$(ls -dt "$ROOT"/*"$DESC"* 2>/dev/null | head -1)
[ -z "$RUN" ] && { stamp "NO RUN DIR - ABORT"; exit 1; }
if ! ls -d "$RUN"/network-snapshot-* >/dev/null 2>&1; then
  stamp "LEG1 PRODUCED NO SNAPSHOT in $RUN - ABORT"
  exit 1
fi

stamp "EXPORT EMA (leg1 latest) run=$RUN"
python scripts/infra/export_ema.py --run-dir "$RUN" --snapshot latest \
  --out "$RUN/g_ema_leg1.npz" >> "$LOG" 2>&1
echo "--- rc=$? $(date -u +%T)" >> "$LOG"

stamp "FLAGSHIP LEG2 (resume $RUN -> ${KIMG2} kimg)"
timeout "${LEG2_TIMEOUT:-14400}" python scripts/train.py --run-dir "$RUN" \
  --max-kimg "$KIMG2" >> "$LOG" 2>&1
echo "--- rc=$? $(date -u +%T)" >> "$LOG"

stamp "EXPORT EMA (leg2 latest)"
python scripts/infra/export_ema.py --run-dir "$RUN" --snapshot latest \
  --out "$RUN/g_ema_leg2.npz" >> "$LOG" 2>&1
echo "--- rc=$? $(date -u +%T)" >> "$LOG"

# offline FID on the final snapshot (micro-batched render; RandomProjection
# fallback detector unless real InceptionV3 weights appear in-env)
SNAP=$(ls -d "$RUN"/network-snapshot-*/ 2>/dev/null | sort | tail -1)
if [ -n "$SNAP" ]; then
  stamp "OFFLINE FID ($SNAP)"
  timeout 3600 python scripts/calc_metrics.py --run-dir "$RUN" \
    --snapshot "$SNAP" --metrics fid2k_full --batch-gpu 4 >> "$LOG" 2>&1
  echo "--- rc=$? $(date -u +%T)" >> "$LOG"
fi
stamp "R5 FLAGSHIP DONE"

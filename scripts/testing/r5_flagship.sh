#!/bin/bash
# Round-5 flagship-shape chain (TODO round-5 item 3): the r4-flagship-b leg
# landed 30 kimg of stable 256^2 training but its orbax snapshots (159 MB)
# were never committed and died with the session. This chain makes the
# artifact durable:
#   leg 1  -> 50 kimg  (synth256 preset, in-loop eval now micro-batched at
#                       EvalContext.batch_gpu=4, the fix for the remote-
#                       compile HTTP 500 that killed two r4 legs at tick 5)
#   leg 2  -> resume via --run-dir to 100 kimg (the resume demo)
#   export -> EMA-only .npz per leg end (scripts/infra/export_ema.py,
#             ~1/6 of a full TrainState; small enough to commit, enough to
#             reload for offline FID / inference / serving export)
#   fid    -> offline fid2k_full on the exported snapshots
# Sized to the chip: ~9.8 imgs/s at this shape (bench.py, reuse-fakes
# default) -> ~102 s/kimg -> 50 kimg/leg ~= 1.5 h + one compile each.
cd /root/repo || exit 1
LOG=experiments/r5_flagship.log
ROOT=experiments
KIMG1=${KIMG1:-50}
KIMG2=${KIMG2:-100}

stamp() { echo "=== $* $(date -u +%F' '%T) ===" >> "$LOG"; }

if [ ! -d data/synth256 ]; then
  stamp "REGEN data/synth256"
  python data_scripts/make_synthetic_dataset.py --out data/synth256 \
    --n 2000 --res 256 --classes 4 >> "$LOG" 2>&1
fi

stamp "FLAGSHIP LEG1 (to ${KIMG1} kimg)"
timeout 14400 python scripts/train.py --preset synth256 --desc r5-flagship \
  --max-kimg "$KIMG1" --run-root "$ROOT" >> "$LOG" 2>&1
echo "--- rc=$? $(date -u +%T)" >> "$LOG"

RUN=$(ls -d "$ROOT"/*r5-flagship* 2>/dev/null | tail -1)
[ -z "$RUN" ] && { stamp "NO RUN DIR - ABORT"; exit 1; }

stamp "EXPORT EMA (leg1 latest)"
python scripts/infra/export_ema.py --run-dir "$RUN" --snapshot latest \
  --out "$RUN/g_ema_leg1.npz" >> "$LOG" 2>&1
echo "--- rc=$? $(date -u +%T)" >> "$LOG"

stamp "FLAGSHIP LEG2 (resume $RUN -> ${KIMG2} kimg)"
timeout 14400 python scripts/train.py --run-dir "$RUN" \
  --max-kimg "$KIMG2" >> "$LOG" 2>&1
echo "--- rc=$? $(date -u +%T)" >> "$LOG"

stamp "EXPORT EMA (leg2 latest)"
python scripts/infra/export_ema.py --run-dir "$RUN" --snapshot latest \
  --out "$RUN/g_ema_leg2.npz" >> "$LOG" 2>&1
echo "--- rc=$? $(date -u +%T)" >> "$LOG"

# offline FID on the final snapshot (micro-batched render; RandomProjection
# fallback detector unless real InceptionV3 weights appear in-env)
SNAP=$(ls -d "$RUN"/network-snapshot-*/ 2>/dev/null | tail -1)
if [ -n "$SNAP" ]; then
  stamp "OFFLINE FID ($SNAP)"
  timeout 3600 python scripts/calc_metrics.py --run-dir "$RUN" \
    --snapshot "$SNAP" --metrics fid2k_full --batch-gpu 4 >> "$LOG" 2>&1
  echo "--- rc=$? $(date -u +%T)" >> "$LOG"
fi
stamp "R5 FLAGSHIP DONE"

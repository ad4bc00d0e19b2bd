#!/bin/bash
# Round-4 flagship-shape dynamics run (VERDICT r4 item 4): synth256 preset —
# satellite channel widths, 256^2 output, 64^2 patches, ADA + patch/depth/
# nerf-noise anneals, camera+depth adaptors, R1, fid2k-proxy — run in TWO
# legs with a mid-run --run-dir resume (the resume demo VERDICT item 4 asks
# for; the round-3 flagship chain never landed).
#
# Sized to the chip: ~7.3 imgs/s at this exact shape (bench.py) ->
# ~137 s/kimg -> 50 kimg/leg ~= 1.9h + one ~12 min compile each.
cd /root/repo || exit 1
LOG=experiments/r4_flagship.log
ROOT=experiments
KIMG1=${KIMG1:-50}
KIMG2=${KIMG2:-100}

if [ ! -d data/synth256 ]; then
  python data_scripts/make_synthetic_dataset.py --out data/synth256 \
    --n 2000 --res 256 --classes 4 >> "$LOG" 2>&1
fi

echo "=== FLAGSHIP LEG1 (to ${KIMG1} kimg) $(date -u +%F' '%T) ===" >> "$LOG"
timeout 14400 python scripts/train.py --preset synth256 --desc r4-flagship \
  --max-kimg "$KIMG1" --run-root "$ROOT" >> "$LOG" 2>&1
echo "--- rc=$? $(date -u +%T)" >> "$LOG"

RUN=$(ls -d "$ROOT"/*r4-flagship* 2>/dev/null | tail -1)
if [ -n "$RUN" ]; then
  echo "=== FLAGSHIP LEG2 (resume $RUN -> ${KIMG2} kimg) $(date -u +%F' '%T) ===" >> "$LOG"
  timeout 14400 python scripts/train.py --run-dir "$RUN" \
    --max-kimg "$KIMG2" >> "$LOG" 2>&1
  echo "--- rc=$? $(date -u +%T)" >> "$LOG"
fi
echo "=== FLAGSHIP DONE $(date -u +%F' '%T) ===" >> "$LOG"

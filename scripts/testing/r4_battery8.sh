#!/bin/bash
# Round-4 battery part 8 — resume of battery7 (killed mid-stage-3 when the
# builder session died 2026-08-19 ~05:49) plus the microbatch rungs the
# battery7 plain-b24 HBM dump motivates.
#
# Battery7 results already in the ledger:
#   1. plain b16 anchor (repacked kernel): 7.314 imgs/s — matches the
#      pre-repack 7.31, kernel change perf-neutral as expected.
#   2. plain b24: SMEM now fits (repack worked) but HBM OOM by 432MB
#      (16.17G of 15.75G); top allocs are decoder-stack activations at
#      512^2 scaling with batch -> the microbatch scan body (compiles at
#      micro size) is the right lever, not more kernel work.
#
# Remaining ladder (each stage ~26 min, compile-dominated):
#   3. decoder_remat=False at b16 — shippable if it fits + wins (numerics
#      identical).
#   4. fake reuse at b16 — the big structural row-count lever (deletes one
#      of the two renders/step); opt-in until r4_ab_dynamics shows
#      FID-neutrality.
#   5. b24 with batch_gpu=8 — microbatch scan; activations compile at
#      micro size so the 512^2 decoder stack stops scaling with batch.
#   6. b32 with batch_gpu=8 — same body, more scan trips.
#   7. reuse at b24/bg8 — compose the two best levers if 4 and 5 both land.
cd /root/repo || exit 1
LOG=experiments/r4_measure.log

stage() {
  name=$1; shift
  echo "=== STAGE $name $(date -u +%F' '%T) ===" >> "$LOG"
  timeout 2400 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $(date -u +%T)" >> "$LOG"
}

stage bench_b16_noremat env TDGP_NO_DECODER_REMAT=1 python bench.py --single 16 none
stage bench_b16_reuse   env TDGP_REUSE_FAKES=1 python bench.py --single 16 none
stage bench_b24_bg8     python bench.py --single 24 8
stage bench_b32_bg8     python bench.py --single 32 8
stage bench_b24_bg8_reuse env TDGP_REUSE_FAKES=1 python bench.py --single 24 8

echo "=== BATTERY8 DONE $(date -u +%F' '%T) ===" >> "$LOG"

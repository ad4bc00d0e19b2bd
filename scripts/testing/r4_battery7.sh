#!/bin/bash
# Round-4 battery part 7 — post-SMEM-repack ladder (each bench stage ~26
# min: compile dominates; axon does not hit the persistent compile cache).
#
# Preceded by scripts/testing/onchip_splat_parity.py (run 2026-08-19 04:59,
# ALL OK) validating the repacked kernel's zero-init aliasing path on
# hardware (ADVICE r3 item 1).
#
#   1. plain b16 anchor — first ladder number produced by the repacked
#      kernel (all round-3 numbers predate it).
#   2. plain b24 — the round-3 OOM was SMEM (1.29M of 1.00M, six 220K
#      prefetched meta operands); the 6-to-2 repack should fit (ADVICE r3
#      item 3: ladder needs a post-fix shipped-defaults b24 number).
#   3. decoder_remat=False at b16 — pure memory/compute tradeoff, numerics
#      identical; shippable default the moment it fits + wins.
#   4. fake reuse at b16 — the big structural row-count lever (deletes one
#      of the two renders/step); opt-in until r4_ab_dynamics.sh shows
#      FID-neutrality, but the throughput number decides whether the A/B
#      is worth chip-hours.
#   5. decoder_remat=False at b24 — only meaningful if 2 fits and 3 wins.
cd /root/repo || exit 1
LOG=experiments/r4_measure.log

stage() {
  name=$1; shift
  echo "=== STAGE $name $(date -u +%F' '%T) ===" >> "$LOG"
  timeout 2400 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $(date -u +%T)" >> "$LOG"
}

stage bench_b16_anchor  python bench.py --single 16 none
stage bench_b24         python bench.py --single 24 none
stage bench_b16_noremat env TDGP_NO_DECODER_REMAT=1 python bench.py --single 16 none
stage bench_b16_reuse   env TDGP_REUSE_FAKES=1 python bench.py --single 16 none
stage bench_b24_noremat env TDGP_NO_DECODER_REMAT=1 python bench.py --single 24 none

echo "=== BATTERY7 DONE $(date -u +%F' '%T) ===" >> "$LOG"

#!/bin/bash
# Round-4 battery part 6 — remaining shippable-lever benches not harvested
# in round 3 (each stage ~26 min: compile dominates; axon does not hit the
# persistent compile cache). Run FIRST thing in a round-4 session so results
# can be harvested, defaults flipped, and the ladder re-tuned in-session.
#
#   1. decoder_remat=False at b16 — pure memory/compute tradeoff, numerics
#      identical; shippable default the moment it fits + wins.
#   2. fake reuse at b16 — the big structural row-count lever (deletes one
#      of the two renders/step); opt-in until the r4_ab_dynamics.sh run
#      shows FID-neutrality, but the throughput number decides whether the
#      A/B is worth chip-hours.
#   3. decoder_remat=False at b24 — only if stage 1 won and the round-3
#      b24 stage fit (see experiments/r3_measure.log bench_b24).
cd /root/repo || exit 1
LOG=experiments/r3_measure.log

stage() {
  name=$1; shift
  echo "=== STAGE $name $(date -u +%F' '%T) ===" >> "$LOG"
  timeout 2400 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $(date -u +%T)" >> "$LOG"
}

stage bench_b16_noremat env TDGP_NO_DECODER_REMAT=1 python bench.py --single 16 none
stage bench_b16_reuse env TDGP_REUSE_FAKES=1 python bench.py --single 16 none
stage bench_b24_noremat env TDGP_NO_DECODER_REMAT=1 python bench.py --single 24 none

echo "=== BATTERY6 DONE $(date -u +%F' '%T) ===" >> "$LOG"

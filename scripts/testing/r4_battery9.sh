#!/bin/bash
# Round-4 battery 9 (runs from r4_chain2.sh after the A/B battery):
#   1. b24 bg=4 reuse — battery8's (24,8)/(32,8) rungs compiled their
#      plain program but OOM'd HBM in the step_r1 program; micro=4 halves
#      the scan-body activation peak again (ledger: the step is row-bound,
#      so extra scan sequencing should be ~neutral if it fits).
#   2. b16 reuse + TDGP_SPLAT_TABLE=bf16 — the one splat-kernel lever
#      never measured on hardware (round-3 battery lost it to source skew):
#      fp32 VMEM run accumulator, bf16 HBM window-table write, halving the
#      kernel's table write + the unfold's read.
cd /root/repo || exit 1
LOG=experiments/r4_measure.log

stage() {
  name=$1; shift
  echo "=== STAGE $name $(date -u +%F' '%T) ===" >> "$LOG"
  timeout 2400 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $(date -u +%T)" >> "$LOG"
}

#   3. b24 bg=8 reuse RERUN — battery8's run of this rung OOM'd at 10:49
#      while a stray builder diagnostic was CONTENDING for the chip
#      (diag_equiv_noise.py picked up JAX_PLATFORMS=axon ~10:36-10:49);
#      uncontended it may fit.
stage profile_fwd_decomp env N=16 python scripts/testing/profile_fwd_decomp.py
stage bench_b24_bg8_reuse_rerun env TDGP_REUSE_FAKES=1 python bench.py --single 24 8
stage bench_b24_bg4_reuse env TDGP_REUSE_FAKES=1 python bench.py --single 24 4
stage bench_b16_reuse_tablebf16 \
  env TDGP_REUSE_FAKES=1 TDGP_SPLAT_TABLE=bf16 python bench.py --single 16 none

# driver-entry compile check on the real chip (verify-skill surface;
# the chip is otherwise continuously occupied by the round-4 chain)
stage graft_entry python __graft_entry__.py

echo "=== BATTERY9 DONE $(date -u +%F' '%T) ===" >> "$LOG"

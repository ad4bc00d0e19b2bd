#!/bin/bash
# Round-3 on-chip measurement battery (serial — one chip).
# Stages ordered by value-per-minute; each bounded by timeout.
# Log: experiments/r3_measure.log (committed runs cite it in DESIGN.md ledger).
cd /root/repo || exit 1
LOG=experiments/r3_measure.log
mkdir -p experiments

stage() {
  name=$1; shift
  echo "=== STAGE $name $(date -u +%F' '%T) ===" >> "$LOG"
  timeout 2400 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $(date -u +%T)" >> "$LOG"
}

# 1. kernel-level splat sweep (small compiles, informs WROWS/table choices)
stage splat_default           python scripts/testing/profile_splat.py
stage splat_wrows4   env TDGP_SPLAT_WROWS=4 python scripts/testing/profile_splat.py
stage splat_wrows8   env TDGP_SPLAT_WROWS=8 python scripts/testing/profile_splat.py
stage splat_table_bf16 env TDGP_SPLAT_TABLE=bf16 python scripts/testing/profile_splat.py
stage splat_chunk1024 env TDGP_SPLAT_CHUNK=1024 python scripts/testing/profile_splat.py

# 2. full-step base (b16, shipped defaults) — the comparison anchor
stage bench_b16_base          python bench.py --single 16 none

# 3. Dmain levers (full step, b16)
stage bench_b16_reuse  env TDGP_REUSE_FAKES=1 python bench.py --single 16 none
stage bench_b16_dmainbf16 env TDGP_DMAIN_BF16=1 python bench.py --single 16 none
stage bench_b16_noremat env TDGP_NO_DECODER_REMAT=1 python bench.py --single 16 none

# 4. phase decomposition at b16
stage phases_b16     env N=16 python scripts/testing/profile_step_phases.py

echo "=== BATTERY DONE $(date -u +%F' '%T) ===" >> "$LOG"

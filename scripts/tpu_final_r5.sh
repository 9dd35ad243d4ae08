#!/bin/bash
# Round-5 final validation batch at HEAD. Run: nohup scripts/tpu_final_r5.sh &
set -u
LOG=${WFL_R5F_LOG:-/tmp/tpu_r5_final.log}
cd "$(dirname "$0")/.."

run() {
  echo "===== [$(date +%T)] $*" >> "$LOG"
  "$@" >> "$LOG" 2>&1
  echo "----- [$(date +%T)] rc=$?" >> "$LOG"
}

# 1. serving bench at final HEAD (docs-only + clamp-order changes since
#    the r5 batch; expect the same ~3150 band)
run python bench.py

# 2. packed nb=2 now clamps to SEQUENTIAL nb=2 (review fix) — the
#    measurement the r4/r5 A/B never actually produced
run env WFL_CONV_PACKED=1 WFL_CONV_BB=2 python scripts/ablate_conv.py 16 30

# 3. int8 probe under the two-sided scatter guard (dyn-quant leg was
#    UNRELIABLE in the r5 run)
run python scripts/probe_int8.py

echo "===== [$(date +%T)] R5 FINAL BATCH DONE" >> "$LOG"

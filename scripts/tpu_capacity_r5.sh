#!/bin/bash
# Post-lse-fix HBM capacity probes: configs that OOM'd (or were never
# tried) before the compact lse residual. Run: nohup scripts/tpu_capacity_r5.sh &
set -u
LOG=${WFL_R5C_LOG:-/tmp/tpu_r5_capacity.log}
cd "$(dirname "$0")/.."

run() {
  echo "===== [$(date +%T)] $*" >> "$LOG"
  "$@" >> "$LOG" 2>&1
  echo "----- [$(date +%T)] rc=$?" >> "$LOG"
}

# wavlm-large B=8 x 30 s WITHOUT remat (r4/r5 only measured B=4 no-remat
# and B=8 WITH remat at 807 ms)
run env WFL_TRAIN_DTYPE=bf16 WFL_TRAIN_PRESET=large python scripts/train_bench.py 8 30

# wavlm-base B=16 x 30 s (flash path; does doubling batch beat 2x328 ms?)
run env WFL_TRAIN_DTYPE=bf16 python scripts/train_bench.py 16 30

echo "===== [$(date +%T)] R5 CAPACITY BATCH DONE" >> "$LOG"

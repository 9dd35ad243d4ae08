#!/bin/bash
# Round-5 TPU measurement batch. Run with:  nohup scripts/tpu_pending_r5.sh &
# Results append to /tmp/tpu_r5_runs.log (copy into docs/ when done).
set -u
LOG=${WFL_R5_LOG:-/tmp/tpu_r5_runs.log}
cd "$(dirname "$0")/.."

run() {
  echo "===== [$(date +%T)] $*" >> "$LOG"
  "$@" >> "$LOG" 2>&1
  echo "----- [$(date +%T)] rc=$?" >> "$LOG"
}

# 1. wavlm-large B=4x30s WITHOUT remat — the r4 OOM case the lse-residual
#    fix (compact [B,H,T] flash lse) is supposed to rescue.
run env WFL_TRAIN_DTYPE=bf16 WFL_TRAIN_PRESET=large python scripts/train_bench.py 4 30

# 2. base train step revalidation after the lse change (target ~328 ms)
run env WFL_TRAIN_DTYPE=bf16 python scripts/train_bench.py 8 30
run env WFL_TRAIN_DTYPE=bf16 python scripts/train_bench.py 8 30

# 3. serving bench revalidation (lse fix touches only want_lse=True, but
#    confirm no serving regression)
run python bench.py

# 4. flagship parity + rtfx at HEAD (VERDICT r4 task 5)
run python scripts/flagship_validate.py parity
run python scripts/flagship_validate.py rtfx

# 5. int8 probe (fixed K-copies) — settle the int8 story
run python scripts/probe_int8.py

# 6. conv-chain experiments under the VMEM budget model:
#    packed nb=2 must now CLAMP (not brick); megatile sweep = fatter tiles
#    with shorter chains (per-tile VMEM trades against invocation count).
run env WFL_CONV_PACKED=1 WFL_CONV_BB=2 python scripts/ablate_conv.py 16 30
run env WFL_CONV_TILE=256 WFL_CONV_CHAIN=2 python scripts/ablate_conv.py 16 30
run env WFL_CONV_TILE=384 WFL_CONV_CHAIN=2 python scripts/ablate_conv.py 16 30
run env WFL_CONV_TILE=512 WFL_CONV_CHAIN=1 python scripts/ablate_conv.py 16 30

# 7. wavlm-large with remat at B=8 (compare r4's 806 ms)
run env WFL_TRAIN_DTYPE=bf16 WFL_TRAIN_PRESET=large WFL_TRAIN_REMAT=1 python scripts/train_bench.py 8 30

echo "===== [$(date +%T)] R5 BATCH DONE" >> "$LOG"

#!/bin/bash
# Round-4 pending TPU measurements, run serially the moment the relay is up.
# NO `timeout` wrappers: SIGTERM mid-remote-compile wedges the relay
# (CLAUDE.md) — run under nohup and poll the log instead.
#
#   nohup bash scripts/tpu_pending_r4.sh > /tmp/tpu_r4_runs.log 2>&1 &
#
# Order: cheap/headline first so a relay drop mid-batch still yields the
# most important numbers.
set -u
cd "$(dirname "$0")/.."

stamp() { date +%H:%M:%S; }
run() {
  echo "===== [$(stamp)] $*"
  "$@"
  local rc=$?   # capture BEFORE the next $(stamp) substitution clobbers $?
  echo "----- [$(stamp)] rc=$rc"
}

# 1. Headline bench revalidation (r3's number was never driver-captured).
run python bench.py

# 2. int8 serving A/B (gates the serving_quantization mode).
run env WFL_BENCH_QUANT=int8 python bench.py

# 3. Raw int8-vs-bf16 MXU probe (context for #2).
run python scripts/probe_int8.py

# 4. Conv grid-packing A/B (VERDICT #6): packed taller-matmul kernel vs
#    the per-row default. Control first (same session, same relay noise).
run python scripts/ablate_conv.py 16 30
run env WFL_CONV_BB=2 WFL_CONV_PACKED=1 python scripts/ablate_conv.py 16 30
run env WFL_CONV_BB=4 WFL_CONV_PACKED=1 WFL_CONV_TILE=64 python scripts/ablate_conv.py 16 30

# 5. Packed-mode serving impact, if #4 shows a win at the bench shape.
run env WFL_CONV_BB=2 WFL_CONV_PACKED=1 python bench.py

# 6. Training revalidation at wavlm-base (328.5 ms/step claim).
run env WFL_TRAIN_DTYPE=bf16 python scripts/train_bench.py 8 30

# 7. wavlm-large training throughput (the flagship memory case; compile
#    can exceed 10 min — LAST so everything else lands first).
run env WFL_TRAIN_DTYPE=bf16 WFL_TRAIN_PRESET=large python scripts/train_bench.py 4 30

# 8. Gradient-checkpointing A/B (training.remat): step-time cost at base,
#    and the batch headroom it buys at wavlm-large (B=8 OOMs without it?).
run env WFL_TRAIN_DTYPE=bf16 WFL_TRAIN_REMAT=1 python scripts/train_bench.py 8 30
run env WFL_TRAIN_DTYPE=bf16 WFL_TRAIN_PRESET=large WFL_TRAIN_REMAT=1 python scripts/train_bench.py 8 30

echo "===== [$(stamp)] ALL DONE"

"""Head-dim MXU utilization probe (VERDICT r1 item 9).

Question: the flash kernel's QK^T / PV matmuls contract over D=64 while the
MXU is 128 deep — does packing work into 128-wide contractions pay?

Head *packing* (two 64-dim heads per 128-lane matmul) is mathematically
unsound for attention: stacking heads along the contraction dim computes
q_h1·k_h1 + q_h2·k_h2 — the SUM of two heads' score matrices — and P
differs per head in PV, so neither matmul can share lanes across heads.

What CAN be measured is the utilization gap itself: run the flash kernel
at equal FLOPs with (H=12, D=64) vs (H=6, D=128). The difference bounds
what any packing scheme could ever recover.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

# repo root relative to this file (worktree-safe for A/B runs)
import os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
from wfl_asr_tpu.ops.pallas.flash_attention import flash_attention

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
T = int(sys.argv[2]) if len(sys.argv) > 2 else 1499


def hard_sync(x):
    np.asarray(x[0, 0, :2, :2])


def timeit(fn, *args, iters=8):
    hard_sync(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        hard_sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


rng = np.random.RandomState(0)
for h, d in [(12, 64), (6, 128)]:
    q, k, v = (jnp.asarray(rng.randn(B, h, T, d).astype(np.float32) * 0.3)
               .astype(jnp.bfloat16) for _ in range(3))
    ms = timeit(flash_attention, q, k, v)
    flops = 4 * B * h * T * T * d
    print(f"H={h:3d} D={d:3d}: {ms:7.2f} ms  "
          f"({flops / (ms * 1e-3) / 1e12:.1f} TFLOP/s)", flush=True)

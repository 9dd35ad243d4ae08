"""Dispatch-amortized timing of the biased flash-attention VJP.

Times K chained fwd+bwd passes of the WavLM-shaped gated-bias flash
attention (the training hot kernel) and reports per-pass cost with the
~32 ms relay dispatch cancelled (same K-copies methodology as
scripts/ablate_conv.py). WFL_FLASH_BWD_BQ / WFL_FLASH_BWD_BK sweep the
backward tiles (see flash_attention._flash_vjp_bwd).

Usage: python scripts/ablate_flash_bwd.py [B] [T] [fwd|vjp]
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

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
T = int(sys.argv[2]) if len(sys.argv) > 2 else 1500
MODE = sys.argv[3] if len(sys.argv) > 3 else "vjp"
H, D = 12, 64
K = 8

rng = np.random.RandomState(0)
q = jnp.asarray(rng.randn(B, H, T, D), jnp.bfloat16) * 0.1
k = jnp.asarray(rng.randn(B, H, T, D), jnp.bfloat16) * 0.1
v = jnp.asarray(rng.randn(B, H, T, D), jnp.bfloat16) * 0.1
bias = jnp.asarray(rng.randn(H, T, T), jnp.bfloat16) * 0.1
gate = jnp.asarray(rng.rand(B, H, T), jnp.bfloat16)


def one(q_, k_, v_, bias_, gate_):
    if MODE == "fwd":
        return flash_attention(q_, k_, v_, bias_, gate_)

    def loss(args):
        return jnp.sum(flash_attention(*args).astype(jnp.float32) ** 2)

    g = jax.grad(loss)((q_, k_, v_, bias_, gate_))
    return g[0]


@jax.jit
def chain(q_, k_, v_, bias_, gate_, n):
    # n copies chained through q so XLA cannot dedupe them.
    def body(i, acc):
        return acc + 1e-6 * one(q_ + acc * 0, k_, v_, bias_, gate_)
    return jax.lax.fori_loop(0, n, body, jnp.zeros_like(q_))


def timed(n):
    t0 = time.time()
    out = chain(q, k, v, bias, gate, n)
    np.asarray(out[0, 0, 0])  # hard sync (block_until_ready unreliable here)
    return time.time() - t0


print(f"flash {MODE}: B={B} H={H} T={T} D={D} bf16, K-copies", flush=True)
timed(1)
timed(K)  # compile both variants
t1 = min(timed(1) for _ in range(4))
tk = min(timed(K) for _ in range(4))
per = (tk - t1) / (K - 1)
print(f"1-copy {t1*1e3:.1f} ms, {K}-copy {tk*1e3:.1f} ms -> "
      f"per-pass {per*1e3:.2f} ms ({MODE})", flush=True)

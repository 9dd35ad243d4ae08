"""Probe: does an int8xint8->int32 matmul beat bf16xbf16->f32 on this chip
at serving shapes? Gates whether a quantized serving mode is worth building.

K-copies trick (see scripts/ablate_conv.py) to cancel the ~32 ms relay
dispatch: time jit(f) that applies the matmul K times to independent
buffers, difference two K values.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

# repo root relative to this file (worktree-safe for A/B runs)
import os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

M, K, N = 8 * 1499, 768, 3072
K1, K2 = 8, 40
REPS = 5


def bench(make_args, op, label):
    def many(k):
        args = [make_args(i) for i in range(k)]
        # Guard against the r4 failure mode: identical buffers reused for
        # every copy let the compiler/runtime collapse the K copies, making
        # t(K) flat and the K-difference pure noise (negative ms resulted).
        ids = {id(a[0]) for a in args}
        assert len(ids) == k, f"{label}: copies must be distinct buffers"

        @jax.jit
        def f(args):
            return [op(*a) for a in args]

        out = f(args)
        np.asarray(out[0]).ravel()[:1]  # force
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            out = f(args)
            np.asarray(out[-1]).ravel()[:1]
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)), ts

    (t1, raw1), (t2, raw2) = many(K1), many(K2)
    per = (t2 - t1) / (K2 - K1) * 1e3
    print(f"  t(K={K1})={t1 * 1e3:.1f} ms {np.round(np.array(raw1) * 1e3, 1)}"
          f"   t(K={K2})={t2 * 1e3:.1f} ms {np.round(np.array(raw2) * 1e3, 1)}",
          flush=True)
    if per <= 0 or t2 <= t1:
        print(f"{label}: UNRELIABLE (t(K={K2}) <= t(K={K1}); relay noise or "
              "collapsed copies) — rerun", flush=True)
        return float("nan")
    # Two-sided confidence: the K-delta must also clear the run-to-run
    # scatter of the medians it was computed from, or the per-matmul
    # figure is relay noise wearing a number.
    mad = lambda ts: float(np.median(np.abs(np.array(ts) - np.median(ts))))
    spread = np.hypot(mad(raw1), mad(raw2))
    conf = "" if (t2 - t1) > 2 * spread else (
        f"  [LOW CONFIDENCE: K-delta {1e3 * (t2 - t1):.0f} ms vs rep "
        f"scatter ~{1e3 * spread:.0f} ms — treat as an upper bound]")
    print(f"{label}: {per:.3f} ms per matmul "
          f"({2 * M * K * N / (per / 1e3) / 1e12:.1f} TOP/s){conf}",
          flush=True)
    return per


rng = np.random.RandomState(0)
a_bf = jnp.asarray(rng.randn(M, K).astype(np.float32), jnp.bfloat16)
b_bf = jnp.asarray(rng.randn(K, N).astype(np.float32), jnp.bfloat16)
a_i8 = jnp.asarray(rng.randint(-127, 127, (M, K)), jnp.int8)
b_i8 = jnp.asarray(rng.randint(-127, 127, (K, N)), jnp.int8)


def mm_bf(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def mm_i8(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)


def mm_i8_dyn(a, b):
    # dynamic per-row activation quantization + int8 matmul + rescale —
    # the full cost of a drop-in quantized layer (weight scales folded).
    s = jnp.max(jnp.abs(a), axis=1, keepdims=True) / 127.0
    qa = jnp.round(a.astype(jnp.float32) / s).astype(jnp.int8)
    acc = jax.lax.dot_general(qa, b, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * s


t_bf = bench(lambda i: (a_bf + i, b_bf), mm_bf, "bf16xbf16->f32")
# distinct int8 activation buffer per copy (weights shared, like serving)
t_i8 = bench(lambda i: (jnp.roll(a_i8, i + 1, axis=0), b_i8), mm_i8,
             "int8xint8->int32")
t_dyn = bench(lambda i: (a_bf + i, b_i8), mm_i8_dyn,
              "bf16 dyn-quant + int8 matmul + rescale")
print(f"speedup raw: {t_bf / t_i8:.2f}x   end-to-end: {t_bf / t_dyn:.2f}x",
      flush=True)

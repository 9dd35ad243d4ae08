"""Conformer main-conv (full C→C, k=31, SAME) formulation probe at serving
shape [8, 1499, 768] bf16: NCH conv (current) vs channels-last conv vs
windowed im2col matmul."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

# repo root relative to this file (worktree-safe for A/B runs)
import os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

B, T, C, KW = 8, 1499, 768, 31
K = 4
rng = np.random.RandomState(0)
x = jnp.asarray((rng.randn(B, T, C) * 0.1).astype(np.float32)) \
    .astype(jnp.bfloat16)
w = jnp.asarray((rng.randn(C, C, KW) * 0.01).astype(np.float32)) \
    .astype(jnp.bfloat16)   # torch OIH


def nch(x, w):
    h = jnp.swapaxes(x, 1, 2)
    y = jax.lax.conv_general_dilated(
        h, w, window_strides=(1,), padding=[(KW // 2, KW // 2)],
        dimension_numbers=("NCH", "OIH", "NCH"))
    return jnp.swapaxes(y, 1, 2)


def nhc(x, w):
    # HIO: [spatial, in, out]
    w_hio = jnp.transpose(w, (2, 1, 0))
    return jax.lax.conv_general_dilated(
        x, w_hio, window_strides=(1,), padding=[(KW // 2, KW // 2)],
        dimension_numbers=("NHC", "HIO", "NHC"))


def im2col(x, w):
    pad = KW // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
    cols = jnp.concatenate([xp[:, j:j + T] for j in range(KW)], axis=-1)
    w_flat = jnp.transpose(w, (2, 1, 0)).reshape(KW * C, C)
    return jax.lax.dot_general(cols, w_flat, (((2,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32) \
        .astype(x.dtype)


def hard_sync(o):
    np.asarray(o[0, :2, :2])


def k_copies(fn, k):
    @jax.jit
    def run(x, w):
        acc = None
        for i in range(k):
            out = fn(x + jnp.asarray(1e-3 * i, x.dtype), w)
            acc = out if acc is None else acc + out
        return acc
    return run


ref = None
for name, fn in [("NCH conv (current)", nch), ("NHC conv", nhc),
                 ("im2col matmul", im2col)]:
    out = jax.jit(fn)(x, w)
    if ref is None:
        ref = np.asarray(out, np.float32)
    else:
        err = float(np.max(np.abs(np.asarray(out, np.float32) - ref)))
        print(f"{name}: max|diff vs NCH| = {err:.4g}", flush=True)
    f1, fk = k_copies(fn, 1), k_copies(fn, K)
    hard_sync(f1(x, w)); hard_sync(fk(x, w))

    def t(f):
        ts = []
        for _ in range(6):
            t0 = time.perf_counter(); hard_sync(f(x, w))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))
    per = (t(fk) - t(f1)) / (K - 1) * 1e3
    print(f"{name}: {per:.2f} ms", flush=True)

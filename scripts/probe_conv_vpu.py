"""Where do the fused conv chains spend their time? (VPU vs MXU vs layout)

Times the layers-1-6 chain kernels (the two chained pallas_calls the model
runs at 30 s) under controlled distortions — each isolates one suspected
cost (numerics are wrong in the variants; only time matters):

  base          the shipped kernel
  nogelu        _gelu_f32 -> identity           (VPU transcendental cost)
  nomerge       pair-merge reshape -> 2 same-FLOP [t,C]x[C,C] matmuls
                (relayout cost; keeps GELU)
  noconcat      halo concat -> main block only  (concat cost)

K-copies methodology cancels the ~32 ms dispatch (see ablate_conv.py).
Usage: python scripts/probe_conv_vpu.py [B] [SECONDS]
"""

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

# repo root relative to this file (worktree-safe for A/B runs)
import os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
from wfl_asr_tpu.ops.pallas import conv_fused as CF

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
SECONDS = float(sys.argv[2]) if len(sys.argv) > 2 else 30.0
C = 512
T1 = int(SECONDS * 16000) // 5          # rows after layer 0 (stride 5)
KS = [3, 3, 3, 3, 2, 2]                 # WavLM layers 1-6
K = 4

rng = np.random.RandomState(0)
x = jnp.asarray(rng.randn(B, T1, C).astype(np.float32) * 0.1, jnp.bfloat16)
weights = [jnp.asarray(rng.randn(C, C, k).astype(np.float32) * 0.02,
                       jnp.bfloat16) for k in KS]


def chains(x_, ws):
    # mirror models/wavlm.py: ≤3-layer chains
    out = x_
    i = 0
    while i < len(ws):
        group = ws[i:i + CF.MAX_CHAIN]
        out = CF._fused_conv_impl(out, list(group), None, CF.DEFAULT_TILE)
        i += CF.MAX_CHAIN
    return out


def k_copies(k):
    @jax.jit
    def run(x_, ws):
        acc = None
        for i in range(k):
            out = chains(x_ + np.float32(1e-6 * i), ws)
            acc = out if acc is None else acc + out
        return acc
    return run


def timeit(fn, iters=6):
    def sync(o):
        np.asarray(o[0, :2, :2])
    sync(fn(x, weights))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(fn(x, weights))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def measure(label):
    t1, tk = timeit(k_copies(1)), timeit(k_copies(K))
    print(f"{label:10s} {(tk - t1) / (K - 1):6.2f} ms  "
          f"(t1={t1:.1f}, t{K}={tk:.1f})", flush=True)


orig_gelu = CF._gelu_f32
orig_kernel = CF._kernel

print(f"conv chains (layers 1-6): B={B} x {SECONDS}s bf16, "
      f"tile={CF.DEFAULT_TILE}, chain<={CF.MAX_CHAIN}", flush=True)

measure("base")

CF._gelu_f32 = lambda v: v
measure("nogelu")
CF._gelu_f32 = orig_gelu


def _kernel_nomerge(x_ref, halo_ref, mean_ref, inv_ref, scale_ref, bias_ref,
                    *rest, ks, t_outs, c, has_norm):
    w_refs, out_ref = rest[:-1], rest[-1]
    cur = jnp.concatenate([x_ref[0], halo_ref[0]], axis=0)
    wi = 0
    for k, t_o in zip(ks, t_outs):
        if k == 3:
            w01, w2 = w_refs[wi][:], w_refs[wi + 1][:]
            wi += 2
            # same MXU FLOPs as the pair-merge path, no relayout:
            # [t,C]x[C,C] against each tap half + the w2 tap.
            acc = jax.lax.dot_general(
                cur[:t_o], w01[:c], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc += jax.lax.dot_general(
                cur[:t_o], w01[c:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc += jax.lax.dot_general(
                cur[:t_o], w2, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            w01 = w_refs[wi][:]
            wi += 1
            acc = jax.lax.dot_general(
                cur[:t_o], w01[:c], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc += jax.lax.dot_general(
                cur[:t_o], w01[c:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        cur = CF._gelu_f32(acc).astype(x_ref.dtype)
    out_ref[0] = cur


CF._kernel = _kernel_nomerge
measure("nomerge")
CF._kernel = orig_kernel

# matmul-only: nomerge structure with GELU stripped too — the de-facto
# MXU+streaming floor of the current grid/tile decomposition. The gap
# between this and the analytic MXU roofline is grid/pipeline overhead
# that tiles or manual DMA would have to attack.
CF._kernel = _kernel_nomerge
CF._gelu_f32 = lambda v: v
measure("mmonly")
CF._gelu_f32 = orig_gelu
CF._kernel = orig_kernel


def _kernel_noconcat(x_ref, halo_ref, mean_ref, inv_ref, scale_ref, bias_ref,
                     *rest, ks, t_outs, c, has_norm):
    w_refs, out_ref = rest[:-1], rest[-1]
    cur = x_ref[0]                      # main rows only — no halo concat
    wi = 0
    for k, t_o in zip(ks, t_outs):
        if k == 3:
            w01, w2 = w_refs[wi][:], w_refs[wi + 1][:]
            wi += 2
            v0 = cur[: 2 * t_o + 2].reshape(t_o + 1, 2 * c)
            acc = jax.lax.dot_general(
                v0[:t_o], w01, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            t2 = jax.lax.dot_general(
                v0[:, :c], w2, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            from jax.experimental.pallas import tpu as pltpu
            acc = acc + pltpu.roll(t2, shift=t_o, axis=0)[:t_o]
        else:
            w01 = w_refs[wi][:]
            wi += 1
            v0 = cur[: 2 * t_o].reshape(t_o, 2 * c)
            acc = jax.lax.dot_general(
                v0, w01, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        cur = CF._gelu_f32(acc).astype(x_ref.dtype)
    out_ref[0] = cur


# noconcat needs main rows to cover the receptive field: pad t_outs down
# is messy — instead reuse the real kernel but slice `cur` from main only.
CF._kernel = _kernel_noconcat
try:
    measure("noconcat")
except Exception as e:  # receptive field may exceed main rows at this tile
    print(f"noconcat   skipped ({type(e).__name__})", flush=True)
CF._kernel = orig_kernel

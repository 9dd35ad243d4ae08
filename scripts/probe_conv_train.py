"""A/B: feature-encoder fwd+bwd cost, NCH XLA convs (the current training
path) vs a channels-last pair-merge matmul formulation (differentiable,
pure XLA — same math as the fused inference kernel, autodiff gives
matmul-transpose gradients instead of conv-grad kernels).

K-copies methodology cancels the ~32 ms dispatch.
Usage: python scripts/probe_conv_train.py [B] [SECONDS]
"""

import dataclasses
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

# repo root relative to this file (worktree-safe for A/B runs)
import os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import __graft_entry__ as graft
from wfl_asr_tpu.models.tagger import init_tagger
from wfl_asr_tpu.models import wavlm as W
from wfl_asr_tpu.models.layers import gelu, group_norm_channels_last
from wfl_asr_tpu.ops.frontend import wav2vec2_normalize

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
SECONDS = float(sys.argv[2]) if len(sys.argv) > 2 else 30.0
K = 3
S = int(SECONDS * 16000)
DTYPE = jnp.bfloat16

arch = graft._flagship_arch(tiny=False)
wa = dataclasses.replace(arch.wavlm, use_fused_conv=False)
params, _ = init_tagger(jax.random.PRNGKey(0), arch)
enc = jax.device_put(params["encoder"])
rng = np.random.RandomState(0)
audio = jnp.asarray((rng.randn(B, S) * 0.1).astype(np.float32))


def conv_nch(enc_p, audio_):
    return W.feature_encoder(enc_p, wa,
                             wav2vec2_normalize(audio_).astype(DTYPE))


def _pair_merge_conv(x, w, k):
    """Channels-last stride-2 VALID conv via row-pair merge + matmul.
    x: [B, T, C]; w: [C, C, k] (torch OIH); k in {2, 3}."""
    b, t_in, c = x.shape
    t = (t_in - k) // 2 + 1
    taps = [w[:, :, j].T.astype(x.dtype) for j in range(k)]
    w01 = jnp.concatenate(taps[:2], axis=0)                  # [2C, C]
    rows = 2 * t + (2 if k == 3 else 0)
    if rows > t_in:
        x = jnp.pad(x, ((0, 0), (0, rows - t_in), (0, 0)))
    v = x[:, :rows].reshape(b, rows // 2, 2 * c)
    acc = jax.lax.dot_general(v[:, :t], w01, (((2,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    if k == 3:
        acc = acc + jax.lax.dot_general(
            v[:, 1:t + 1, :c], taps[2], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    return acc.astype(x.dtype)


def conv_win(enc_p, audio_):
    x16 = wav2vec2_normalize(audio_).astype(DTYPE)
    layers = enc_p["feature_encoder"]
    x = W._conv0_windowed(layers[0], wa, x16)                # [B, T0, C]
    n = layers[0]["norm"]
    x = gelu(group_norm_channels_last(n["scale"], n["bias"], x))
    for layer in layers[1:]:
        w = layer["conv"]["w"]
        x = gelu(_pair_merge_conv(x, w, int(w.shape[2])))
    return x


def vjp_of(fn):
    def loss(enc_p, audio_):
        return jnp.sum(fn(enc_p, audio_).astype(jnp.float32) ** 2)

    def run(enc_p, audio_):
        l, g = jax.value_and_grad(loss)(enc_p, audio_)
        return g["feature_encoder"][1]["conv"]["w"] + l
    return run


def k_copies(fn, k):
    @jax.jit
    def run(enc_p, audio_):
        acc = None
        for i in range(k):
            out = fn(enc_p, audio_ + np.float32(1e-6 * i))
            acc = out if acc is None else acc + out
        return acc
    return run


def timeit(fn, iters=6):
    def sync(o):
        np.asarray(o[:2, :2])
    sync(fn(enc, audio))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(fn(enc, audio))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


# numeric check: the two formulations are the same conv
a = jax.jit(conv_nch)(enc, audio)
b = jax.jit(conv_win)(enc, audio)
err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
print(f"B={B} x {SECONDS}s {DTYPE.__name__}; max |nch - win| = {err:.4g}",
      flush=True)

for label, fn in [("nch fwd+bwd", vjp_of(conv_nch)),
                  ("win fwd+bwd", vjp_of(conv_win))]:
    t1 = timeit(k_copies(fn, 1))
    tk = timeit(k_copies(fn, K))
    print(f"{label}: {(tk - t1) / (K - 1):6.1f} ms  "
          f"(t1={t1:.1f}, t{K}={tk:.1f})", flush=True)

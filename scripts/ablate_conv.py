"""A/B: WavLM feature-encoder conv stack, XLA convs vs the fused Pallas
chain (+ channels-last layer 0), with the ~32 ms axon dispatch overhead
amortized away: each timing runs K CSE-defeated copies inside one jit and
reports (t_K - t_1) / (K - 1)."""

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
from wfl_asr_tpu.ops.frontend import wav2vec2_normalize

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
SECONDS = float(sys.argv[2]) if len(sys.argv) > 2 else 30.0
K = int(sys.argv[3]) if len(sys.argv) > 3 else 4
S = int(SECONDS * 16000)
DTYPE = jnp.bfloat16

arch = graft._flagship_arch(tiny=False)
wa = arch.wavlm
wa_fused = dataclasses.replace(wa, use_fused_conv=True)
params, _ = init_tagger(jax.random.PRNGKey(0), arch)
enc = jax.device_put(params["encoder"])

rng = np.random.RandomState(0)
audio = jnp.asarray((rng.randn(B, S) * 0.1).astype(np.float32))


def hard_sync(x):
    # axon block_until_ready does not reliably block; force a host read.
    np.asarray(x[0, :2, :2])


def k_copies(fn, k):
    @jax.jit
    def run(enc, audio):
        acc = None
        for i in range(k):
            out = fn(enc, audio + np.float32(1e-6 * i))  # defeat CSE
            acc = out if acc is None else acc + out
        return acc
    return run


def timeit(fn, *args, iters=6):
    hard_sync(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        hard_sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def measure(label, fn):
    t1 = timeit(k_copies(fn, 1), enc, audio)
    tk = timeit(k_copies(fn, K), enc, audio)
    per = (tk - t1) / (K - 1)
    print(f"{label}: {per:.1f} ms  (t1={t1:.1f}, t{K}={tk:.1f})", flush=True)
    return per


def conv_xla(enc, audio):
    return W.feature_encoder(enc, wa,
                             wav2vec2_normalize(audio).astype(DTYPE))


def conv_fused(enc, audio):
    return W.feature_encoder(enc, wa_fused,
                             wav2vec2_normalize(audio).astype(DTYPE))


def stage0_cl(enc, audio):
    x = W._conv0_windowed(enc["feature_encoder"][0], wa,
                          wav2vec2_normalize(audio).astype(DTYPE))
    from wfl_asr_tpu.models.layers import gelu, group_norm_channels_last
    n = enc["feature_encoder"][0]["norm"]
    return gelu(group_norm_channels_last(n["scale"], n["bias"], x))


print(f"B={B} x {SECONDS}s, {DTYPE.__name__}, K={K}", flush=True)
a = jax.jit(conv_xla)(enc, audio)
b = jax.jit(conv_fused)(enc, audio)
err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
print(f"max |xla - fused| = {err:.4g}", flush=True)
measure("conv stack XLA  ", conv_xla)
measure("conv stack fused", conv_fused)
measure("stage0 channels-last (L0+GN+GELU)", stage0_cl)

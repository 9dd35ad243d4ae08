"""A/B: WavLM feature-encoder conv stack, XLA convs vs the fused Pallas
chain (ops/pallas/conv_fused.py), hard host-sync timing."""

import dataclasses
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import __graft_entry__ as graft
from wfl_asr_tpu.models.tagger import init_tagger
from wfl_asr_tpu.models import wavlm as W
from wfl_asr_tpu.ops.frontend import wav2vec2_normalize

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
SECONDS = float(sys.argv[2]) if len(sys.argv) > 2 else 30.0
S = int(SECONDS * 16000)
DTYPE = jnp.bfloat16

arch = graft._flagship_arch(tiny=False)
wa = arch.wavlm
wa_fused = dataclasses.replace(wa, use_fused_conv=True)
params, _ = init_tagger(jax.random.PRNGKey(0), arch)
enc = jax.device_put(params["encoder"])

rng = np.random.RandomState(0)
audio = jnp.asarray((rng.randn(B, S) * 0.1).astype(np.float32))


def hard_sync(out):
    # axon block_until_ready does not reliably block; force a host read.
    np.asarray(out[0, :4, :4])


def timeit(fn, *args, iters=6):
    t0 = time.time()
    hard_sync(fn(*args))
    print(f"  compile+first: {time.time()-t0:.1f}s", flush=True)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        hard_sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


@jax.jit
def conv_xla(enc, audio):
    return W.feature_encoder(enc, wa,
                             wav2vec2_normalize(audio).astype(DTYPE))


@jax.jit
def conv_fused(enc, audio):
    return W.feature_encoder(enc, wa_fused,
                             wav2vec2_normalize(audio).astype(DTYPE))


print(f"B={B} x {SECONDS}s, {DTYPE.__name__}", flush=True)
a = conv_xla(enc, audio)
b = conv_fused(enc, audio)
err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
print(f"max |xla - fused| = {err:.4g}", flush=True)
print(f"conv stack XLA:   {timeit(conv_xla, enc, audio):.1f} ms", flush=True)
print(f"conv stack fused: {timeit(conv_fused, enc, audio):.1f} ms", flush=True)

"""Sub-component timings inside the WavLM encoder (TPU)."""

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
from wfl_asr_tpu.models.layers import layer_norm, linear
from wfl_asr_tpu.ops.frontend import wav2vec2_normalize

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
S = 480_000
DTYPE = jnp.bfloat16

arch = graft._flagship_arch(tiny=False)
wa = arch.wavlm
params, _ = init_tagger(jax.random.PRNGKey(0), arch)
enc = jax.device_put(params["encoder"])

rng = np.random.RandomState(0)
audio = jnp.asarray((rng.randn(B, S) * 0.1).astype(np.float32))
T = wa.feature_lengths(S)
feats = jnp.asarray((rng.randn(B, T, wa.hidden_size) * 0.1)
                    .astype(np.float32))


def timeit(fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


@jax.jit
def conv_stack(enc, audio):
    return W.feature_encoder(enc, wa, wav2vec2_normalize(audio)
                             .astype(DTYPE))


@jax.jit
def transformer(enc, x):
    x = x.astype(DTYPE)
    x = x + W._pos_conv_embed(enc, wa, x)
    x = layer_norm(enc["encoder_ln"], x)
    pos_bias = W.position_bias(enc, wa, x.shape[1])
    for layer in enc["layers"]:
        x = W.encoder_layer(layer, wa, x, pos_bias)
    return x


@jax.jit
def one_layer(enc, x):
    x = x.astype(DTYPE)
    pos_bias = W.position_bias(enc, wa, x.shape[1])
    return W.encoder_layer(enc["layers"][0], wa, x, pos_bias)


@jax.jit
def attn_only(enc, x):
    x = x.astype(DTYPE)
    layer = enc["layers"][0]
    pos_bias = W.position_bias(enc, wa, x.shape[1])
    gated = W._gated_bias(layer, wa, x, pos_bias)
    b, t, H = x.shape
    heads, d = wa.num_heads, H // wa.num_heads

    def split(h):
        return h.reshape(b, t, heads, d).transpose(0, 2, 1, 3)
    from wfl_asr_tpu.models.layers import attention_core
    return attention_core(split(linear(layer["q"], x)),
                          split(linear(layer["k"], x)),
                          split(linear(layer["v"], x)), bias=gated)


@jax.jit
def bias_only(enc, x):
    x = x.astype(DTYPE)
    pos_bias = W.position_bias(enc, wa, x.shape[1])
    return W._gated_bias(enc["layers"][0], wa, x, pos_bias)


@jax.jit
def ffn_only(enc, x):
    x = x.astype(DTYPE)
    layer = enc["layers"][0]
    from wfl_asr_tpu.models.layers import gelu
    return linear(layer["ff_out"], gelu(linear(layer["ff_in"], x)))


print(f"B={B}", flush=True)
print(f"conv feature stack: {timeit(conv_stack, enc, audio):.1f} ms", flush=True)
print(f"transformer (12 layers): {timeit(transformer, enc, feats):.1f} ms", flush=True)
print(f"one layer: {timeit(one_layer, enc, feats):.2f} ms", flush=True)
print(f"attention only: {timeit(attn_only, enc, feats):.2f} ms", flush=True)
print(f"gated bias only: {timeit(bias_only, enc, feats):.2f} ms", flush=True)
print(f"ffn only: {timeit(ffn_only, enc, feats):.2f} ms", flush=True)

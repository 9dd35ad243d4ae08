"""Conformer block internals at serving shape [8, 1499, 768] bf16:
attention vs conv-module vs FF halves (dispatch-amortized)."""

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
from wfl_asr_tpu.models import heads as H
from wfl_asr_tpu.models.layers import conv1d, gelu, layer_norm, linear
from wfl_asr_tpu.models.heads import batch_norm

B, T = 8, 1499
K = 4
arch = graft._flagship_arch(tiny=False)
params, state = init_tagger(jax.random.PRNGKey(0), arch)
p = jax.device_put(params["conformer"][0])
st = jax.device_put(state["conformer"][0])
dim, heads = arch.hidden_size, arch.conformer_heads

rng = np.random.RandomState(0)
x = jnp.asarray((rng.randn(B, T, dim) * 0.1).astype(np.float32)) \
    .astype(jnp.bfloat16)


def attn_part(p, x):
    b, t, _ = x.shape
    d = dim // heads

    def split(h):
        return h.reshape(b, t, heads, d).transpose(0, 2, 1, 3)
    from wfl_asr_tpu.ops.pallas.flash_attention_bwd import \
        flash_attention_trainable
    a = flash_attention_trainable(split(linear(p["q"], x)),
                                  split(linear(p["k"], x)),
                                  split(linear(p["v"], x)))
    return linear(p["attn_out"], a.transpose(0, 2, 1, 3).reshape(b, t, dim))


def conv_part(p, x):
    h = jnp.swapaxes(layer_norm(p["ln2"], x), 1, 2)
    h = conv1d(p["conv_pw1"], h)
    a, g = jnp.split(h, 2, axis=1)
    h = a * jax.nn.sigmoid(g)
    h = conv1d(p["conv_main"], h, padding=arch.conformer_kernel // 2)
    h, _ = batch_norm(p["bn"], st["bn"], h, False)
    h = gelu(h)
    h = conv1d(p["conv_pw2"], h)
    return jnp.swapaxes(h, 1, 2)


def ff_part(p, x):
    return (H.ff_module(p["ff1"], x, 0.0, None, True)
            + H.ff_module(p["ff2"], x, 0.0, None, True))


def full_block(p, x):
    return H.conformer_block(p, st, x, heads, arch.conformer_kernel,
                             0.0, None, True, False)[0]


def hard_sync(o):
    np.asarray(o[0, :2, :2])


def k_copies(fn, k):
    @jax.jit
    def run(p, x):
        acc = None
        for i in range(k):
            out = fn(p, x + jnp.asarray(1e-3 * i, x.dtype))
            acc = out if acc is None else acc + out
        return acc
    return run


for name, fn in [("full block", full_block), ("attention part", attn_part),
                 ("conv module", conv_part), ("ff halves", ff_part)]:
    f1, fk = k_copies(fn, 1), k_copies(fn, K)
    hard_sync(f1(p, x)); hard_sync(fk(p, x))

    def t(f):
        ts = []
        for _ in range(6):
            t0 = time.perf_counter(); hard_sync(f(p, x))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))
    per = (t(fk) - t(f1)) / (K - 1) * 1e3
    print(f"{name}: {per:.2f} ms", flush=True)

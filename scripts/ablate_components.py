"""Dispatch-amortized timings of the non-attention serving components:
pos-conv embedding, feature projection, BiLSTM, Conformer pair, dilated
conv, classifier+offset heads, device postprocess."""

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
from wfl_asr_tpu.models import heads as H
from wfl_asr_tpu.models.layers import layer_norm, linear
from wfl_asr_tpu.ops.postprocess import confidence_gate_ids, median_filter_ids

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
T = 1499
K = 4
DTYPE = jnp.bfloat16

arch = graft._flagship_arch(tiny=False)
wa = arch.wavlm
params, state = init_tagger(jax.random.PRNGKey(0), arch)
params = jax.device_put(params)
state = jax.device_put(state)

rng = np.random.RandomState(0)
x = jnp.asarray((rng.randn(B, T, wa.hidden_size) * 0.1)
                .astype(np.float32)).astype(DTYPE)
feats = jnp.asarray((rng.randn(B, T, 512) * 0.1)
                    .astype(np.float32)).astype(DTYPE)
logits = jnp.asarray((rng.randn(B, T, arch.num_labels) * 2)
                     .astype(np.float32))


def hard_sync(o):
    np.asarray(jax.tree_util.tree_leaves(o)[0]).ravel()[:4]


def k_copies(fn, k, *args):
    @jax.jit
    def run(params, state, *a):
        acc = None
        for i in range(k):
            out = fn(params, state, *(q + np.float32(1e-6 * i)
                                      if q.dtype != jnp.int32 else q
                                      for q in a))
            lead = jax.tree_util.tree_leaves(out)[0]
            acc = lead if acc is None else acc + lead
        return acc
    return lambda *a: run(params, state, *a)


def measure(label, fn, *args):
    f1, fk = k_copies(fn, 1, *args), k_copies(fn, K, *args)
    hard_sync(f1(*args)); hard_sync(fk(*args))
    def t(f):
        ts = []
        for _ in range(5):
            t0 = time.perf_counter(); hard_sync(f(*args))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))
    per = (t(fk) - t(f1)) / (K - 1) * 1e3
    print(f"{label}: {per:.2f} ms", flush=True)


enc = params["encoder"]
measure("pos_conv_embed", lambda p, s, x: W._pos_conv_embed(p["encoder"], wa, x), x)
measure("feature_projection",
        lambda p, s, f: linear(p["encoder"]["feature_projection"]["proj"],
                               layer_norm(p["encoder"]["feature_projection"]["ln"], f)),
        feats)
measure("bilstm", lambda p, s, x: H.bilstm(p["bilstm"], x), x)
measure("conformer x2",
        lambda p, s, x: H.conformer_block(
            p["conformer"][1], s["conformer"][1],
            H.conformer_block(p["conformer"][0], s["conformer"][0], x,
                              arch.conformer_heads, arch.conformer_kernel,
                              0.0, None, True, False)[0],
            arch.conformer_heads, arch.conformer_kernel, 0.0, None,
            True, False)[0], x)
measure("dilated_conv", lambda p, s, x: H.dilated_stack(
    p["dilated"], x, arch.dilated_kernel), x)
measure("classifier+offsets",
        lambda p, s, x: (linear(p["classifier"], x),
                         H.offset_head(p["offset_head"], x)), x)
measure("postprocess (gate+median)",
        lambda p, s, lg: median_filter_ids(
            confidence_gate_ids(lg, jnp.float32(0.5), 0), 3), logits)

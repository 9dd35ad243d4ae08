"""Component ablation timings for the flagship inference graph (TPU).

Times: full stack, encoder-only, and the stack with each head disabled —
to find where the wall-clock goes before writing Pallas kernels.
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
from wfl_asr_tpu.models.tagger import apply_tagger, init_tagger
from wfl_asr_tpu.models.wavlm import wavlm_encode
from wfl_asr_tpu.ops.frontend import wav2vec2_normalize

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
S = 480_000
DTYPE = jnp.bfloat16


def hard_sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf)


def timeit(fn, *args, iters=6):
    out = fn(*args)
    hard_sync(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        hard_sync(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def run(arch, params, state, audio, lang):
    @jax.jit
    def f(params, state, audio, lang):
        logits, offsets, _ = apply_tagger(params, state, arch, audio, lang,
                                          compute_dtype=DTYPE)
        return logits, offsets
    return timeit(f, params, state, audio, lang)


def main():
    rng = np.random.RandomState(0)
    audio = jnp.asarray((rng.randn(B, S) * 0.1).astype(np.float32))
    lang = jnp.asarray(np.zeros(B, np.int32))

    base_arch = graft._flagship_arch(tiny=False)
    params, state = init_tagger(jax.random.PRNGKey(0), base_arch)
    params = jax.device_put(params)
    state = jax.device_put(state)

    t_full = run(base_arch, params, state, audio, lang)
    print(f"full: {t_full*1e3:.1f} ms  (RTFx {B*30/t_full:.0f})", flush=True)

    @jax.jit
    def enc_only(params, audio):
        return wavlm_encode(params["encoder"], base_arch.wavlm,
                            wav2vec2_normalize(audio), compute_dtype=DTYPE)
    t_enc = timeit(enc_only, params, audio)
    print(f"encoder only: {t_enc*1e3:.1f} ms", flush=True)

    for name, change in [
        ("no_bilstm", {"enable_bilstm": False}),
        ("no_conformer", {"num_conformer_layers": 0}),
        ("no_dilated", {"enable_dilated_conv": False}),
        ("linear_head_only", {"enable_bilstm": False,
                              "num_conformer_layers": 0,
                              "enable_dilated_conv": False}),
    ]:
        arch = dataclasses.replace(base_arch, **change)
        p, s = init_tagger(jax.random.PRNGKey(0), arch)
        t = run(arch, jax.device_put(p), jax.device_put(s), audio, lang)
        print(f"{name}: {t*1e3:.1f} ms (delta {1e3*(t_full-t):+.1f})",
              flush=True)


if __name__ == "__main__":
    main()

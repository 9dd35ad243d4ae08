"""Training-step throughput at WavLM-base (fwd + bwd + Prodigy) on one chip."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

# repo root relative to this file (worktree-safe for A/B runs)
import os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import __graft_entry__ as graft
from wfl_asr_tpu.models.tagger import init_tagger
from wfl_asr_tpu.train.loop import make_train_step
from wfl_asr_tpu.train.prodigy import prodigy

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
SECONDS = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
S = int(SECONDS * 16000)
T = int(SECONDS / 0.02)

import dataclasses
import os

arch = graft._flagship_arch(tiny=False)
# WFL_TRAIN_PRESET=large (etc.) swaps the WavLM flavor at true dims — the
# "does big-model training fit one chip" probe (docs/PERFORMANCE.md).
preset = os.environ.get("WFL_TRAIN_PRESET")
if preset:
    from wfl_asr_tpu.models.tagger import wavlm_arch_from_name
    wl = wavlm_arch_from_name(preset)
    arch = dataclasses.replace(arch, wavlm=wl, hidden_size=wl.hidden_size)
    print(f"wavlm preset: {preset}", flush=True)
# Mirror train/loop.py: on TPU training runs the differentiable Pallas flash
# attention (incl. WavLM's gated-bias VJP). WFL_TRAIN_FLASH=0 forces XLA
# attention for an A/B comparison.
if (jax.devices()[0].platform == "tpu"
        and os.environ.get("WFL_TRAIN_FLASH", "1") == "1"):
    arch = dataclasses.replace(
        arch, use_flash_attention=True,
        wavlm=dataclasses.replace(arch.wavlm, use_flash_attention=True))
    print("wavlm flash attention: ON", flush=True)
# WFL_TRAIN_STRICT_DROPOUT=1 mirrors training.strict_attention_dropout:
# in-kernel attention-prob dropout on the flash path (the hub presets
# carry attention_dropout=0.1) — measures its step-time cost vs the
# default post-projection substitute.
if os.environ.get("WFL_TRAIN_STRICT_DROPOUT") == "1":
    arch = dataclasses.replace(
        arch, strict_attention_dropout=True,
        wavlm=dataclasses.replace(arch.wavlm, strict_attention_dropout=True,
                                  attention_dropout=0.1))
    print("strict attention dropout: ON (rate 0.1, in-kernel)", flush=True)
params, state = init_tagger(jax.random.PRNGKey(0), arch)


def build(learning_rate):
    return prodigy(learning_rate=learning_rate)


tx = optax.inject_hyperparams(build)(learning_rate=1.0)
opt_state = tx.init(params)
params = jax.device_put(params)
state = jax.device_put(state)
opt_state = jax.device_put(opt_state)

# WFL_TRAIN_DTYPE=bf16 mirrors the config's bf16 training option.
dtype = (jnp.bfloat16 if os.environ.get("WFL_TRAIN_DTYPE") == "bf16"
         else jnp.float32)
# WFL_TRAIN_REMAT=1 mirrors training.remat (encoder gradient checkpointing):
# measures the FLOPs-for-HBM trade — step-time cost vs the batch-size /
# model-size headroom it buys.
remat = os.environ.get("WFL_TRAIN_REMAT") == "1"
step = make_train_step(arch, 0.1, 3.0, tx, compute_dtype=dtype, remat=remat)
print(f"compute dtype: {dtype.__name__}  remat: {remat}", flush=True)
rng = np.random.RandomState(0)
batch = dict(
    audio=jnp.asarray((rng.randn(B, S) * 0.1).astype(np.float32)),
    labels=jnp.asarray(rng.randint(0, arch.num_labels, (B, T)).astype(np.int64)),
    lang_ids=jnp.asarray(np.zeros(B, np.int32)),
    off_f=jnp.asarray(rng.randint(0, T, (B, 64)).astype(np.int32)),
    off_c=jnp.asarray(rng.randint(0, 2, (B, 64)).astype(np.int32)),
    off_x=jnp.asarray(rng.rand(B, 64).astype(np.float32)),
    off_v=jnp.asarray(np.ones((B, 64), bool)),
)


def run(p, ms, os_):
    return step(p, ms, os_, jax.random.PRNGKey(1), batch["audio"],
                batch["labels"], batch["lang_ids"], batch["off_f"],
                batch["off_c"], batch["off_x"], batch["off_v"],
                max_label_len=T)


def hard_sync(out):
    # axon block_until_ready does not reliably block; a host transfer of an
    # updated-param leaf forces completion of the whole step.
    np.asarray(jax.tree_util.tree_leaves(out[0])[0])
    float(out[3]["loss"])


print(f"train step: B={B} x {SECONDS}s audio (T={T})", flush=True)
t0 = time.time()
out = run(params, state, opt_state)
hard_sync(out)
print(f"compile+first: {time.time()-t0:.1f}s", flush=True)
params, state, opt_state = out[0], out[1], out[2]

ts = []
for _ in range(6):
    t0 = time.perf_counter()
    out = run(params, state, opt_state)
    hard_sync(out)
    params, state, opt_state = out[0], out[1], out[2]
    ts.append(time.perf_counter() - t0)
med = float(np.median(ts))
print(f"step: {med*1e3:.1f} ms  ({B/med:.1f} samples/s, "
      f"{B*SECONDS/med:.0f} audio-sec/s)", flush=True)

# Pipelined loop: dispatch step N, then read step N-1's metrics — the
# train loop's one-step-delayed readback (train/loop.py drain_pending).
# Overlaps the ~32 ms relay dispatch + host logging with device compute.
N_PIPE = 10
prev_metrics = None
t0 = time.perf_counter()
for _ in range(N_PIPE):
    out = run(params, state, opt_state)
    params, state, opt_state = out[0], out[1], out[2]
    if prev_metrics is not None:
        float(prev_metrics["loss"])
    prev_metrics = out[3]
float(prev_metrics["loss"])
hard_sync(out)
per = (time.perf_counter() - t0) / N_PIPE
print(f"pipelined loop step: {per*1e3:.1f} ms  ({B/per:.1f} samples/s, "
      f"{B*SECONDS/per:.0f} audio-sec/s)", flush=True)

"""Attribute the WavLM train-step cost across fwd / bwd / optimizer.

Times a dependent chain of N steps for several variants (host enqueues
the chain, device runs back-to-back, one hard sync at the end — the
~32 ms relay dispatch amortizes away):

  full        fwd + bwd + Prodigy (the train_bench configuration)
  sgd         fwd + bwd + plain SGD        -> Prodigy cost by delta
  grads       value_and_grad only          -> optimizer-free step
  frozen      freeze_encoder=True          -> encoder-bwd cost by delta
  fwd         loss forward only            -> bwd cost by delta

Usage: python scripts/ablate_train.py [B] [SECONDS] [variant ...]
Env: WFL_TRAIN_DTYPE=bf16 (default here), WFL_TRAIN_FLASH=0 for XLA attn.
"""

import dataclasses
import os
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
from wfl_asr_tpu.models.tagger import apply_tagger, init_tagger
from wfl_asr_tpu.train.loop import make_train_step
from wfl_asr_tpu.train.losses import cross_entropy, offset_loss
from wfl_asr_tpu.train.prodigy import prodigy

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
SECONDS = float(sys.argv[2]) if len(sys.argv) > 2 else 30.0
VARIANTS = sys.argv[3:] or ["full", "sgd", "grads", "frozen", "fwd"]
S, T = int(SECONDS * 16000), int(SECONDS / 0.02)
N = 5

dtype = (jnp.float32 if os.environ.get("WFL_TRAIN_DTYPE") == "f32"
         else jnp.bfloat16)

arch = graft._flagship_arch(tiny=False)
if (jax.devices()[0].platform == "tpu"
        and os.environ.get("WFL_TRAIN_FLASH", "1") == "1"):
    arch = dataclasses.replace(
        arch, use_flash_attention=True,
        wavlm=dataclasses.replace(arch.wavlm, use_flash_attention=True))

rng = np.random.RandomState(0)
batch = dict(
    audio=jnp.asarray((rng.randn(B, S) * 0.1).astype(np.float32)),
    labels=jnp.asarray(rng.randint(0, arch.num_labels, (B, T))),
    lang_ids=jnp.zeros(B, jnp.int32),
    off_f=jnp.asarray(rng.randint(0, T, (B, 64)).astype(np.int32)),
    off_c=jnp.asarray(rng.randint(0, 2, (B, 64)).astype(np.int32)),
    off_x=jnp.asarray(rng.rand(B, 64).astype(np.float32)),
    off_v=jnp.asarray(np.ones((B, 64), bool)),
)


def chain_time(step_fn, p, ms, os_):
    cur = step_fn(p, ms, os_)
    np.asarray(jax.tree_util.tree_leaves(cur)[0])          # warm compile
    for _ in range(2):
        t0 = time.time()
        for _ in range(N):
            cur = step_fn(*cur[:3])
        np.asarray(jax.tree_util.tree_leaves(cur)[0])      # hard sync
        dt = (time.time() - t0) / N
    return dt


def run_variant(name):
    a = arch
    if name == "frozen":
        a = dataclasses.replace(a, freeze_encoder=True)
    params, state = init_tagger(jax.random.PRNGKey(0), a)
    params = jax.device_put(params)
    state = jax.device_put(state)

    if name in ("full", "sgd", "frozen"):
        tx = (optax.sgd(1e-3) if name == "sgd"
              else optax.inject_hyperparams(
                  lambda learning_rate: prodigy(learning_rate=learning_rate)
              )(learning_rate=1.0))
        opt_state = jax.device_put(tx.init(params))
        step = make_train_step(a, 0.1, 3.0, tx, compute_dtype=dtype)

        def fn(p, ms, os_):
            return step(p, ms, os_, jax.random.PRNGKey(1), batch["audio"],
                        batch["labels"], batch["lang_ids"], batch["off_f"],
                        batch["off_c"], batch["off_x"], batch["off_v"],
                        max_label_len=T)
        dt = chain_time(fn, params, state, opt_state)
    elif name == "grads":
        @jax.jit
        def fn(p, ms, _os=None):
            def loss_fn(q):
                logits, offsets, new_state = apply_tagger(
                    q, ms, a, batch["audio"], batch["lang_ids"],
                    max_label_len=T, rng=jax.random.PRNGKey(1), train=True,
                    compute_dtype=dtype)
                return (cross_entropy(logits, batch["labels"], 0.1)
                        + 3.0 * offset_loss(offsets, batch["off_f"],
                                            batch["off_c"], batch["off_x"],
                                            batch["off_v"])), new_state
            (loss, new_state), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(p)
            # feed grads back into params so the chain stays dependent
            return (jax.tree.map(lambda x, g: x - 0.0 * g.astype(x.dtype),
                                 p, grads), new_state, None)
        dt = chain_time(fn, params, state, None)
    elif name == "fwd":
        @jax.jit
        def fn(p, ms, _os=None):
            logits, offsets, new_state = apply_tagger(
                p, ms, a, batch["audio"], batch["lang_ids"],
                max_label_len=T, rng=jax.random.PRNGKey(1), train=True,
                compute_dtype=dtype)
            loss = (cross_entropy(logits, batch["labels"], 0.1)
                    + 3.0 * offset_loss(offsets, batch["off_f"],
                                        batch["off_c"], batch["off_x"],
                                        batch["off_v"]))
            # keep the chain dependent on the loss
            return (jax.tree.map(
                lambda x: x + (0.0 * loss).astype(x.dtype), p),
                new_state, None)
        dt = chain_time(fn, params, state, None)
    else:
        raise SystemExit(f"unknown variant {name}")
    print(f"{name:8s} {dt*1e3:8.1f} ms/step", flush=True)
    return dt


print(f"train ablation: B={B} x {SECONDS}s (T={T}) {dtype.__name__} "
      f"flash={os.environ.get('WFL_TRAIN_FLASH', '1')}", flush=True)
for v in VARIANTS:
    run_variant(v)

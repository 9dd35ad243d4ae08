"""Frame-label sampling utilities.

API parity with reference infer.py:62-84 (``sample_from_logits`` top-k and
``top_p_sample`` nucleus sampling over per-frame label distributions). Note
that in the reference *pipeline* these are dead code — the sampled ids are
immediately overwritten by the confidence/argmax path (quirk Q2) and the
chunked path never calls them — and our pipeline reproduces that behavior.
They are provided as working functions for API completeness.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_from_logits(rng: jax.Array, logits: jnp.ndarray, k: int = 5,
                       temperature: float = 1.0) -> jnp.ndarray:
    """Top-k sampling per frame. logits [T, C] → ids [T]
    (reference infer.py:62-67 semantics, explicit PRNG key)."""
    probs = jax.nn.softmax(logits / temperature, axis=-1)
    topk_probs, topk_idx = jax.lax.top_k(probs, k)
    topk_probs = topk_probs / jnp.sum(topk_probs, axis=-1, keepdims=True)
    choice = jax.random.categorical(rng, jnp.log(topk_probs), axis=-1)
    return jnp.take_along_axis(topk_idx, choice[:, None], axis=-1)[:, 0]


def top_p_sample(rng: jax.Array, logits: jnp.ndarray, p: float = 0.9,
                 temperature: float = 1.0) -> jnp.ndarray:
    """Nucleus sampling per frame. logits [T, C] → ids [T]
    (reference infer.py:69-84 semantics: keep classes while the cumulative
    probability is <= p, always keeping the top class)."""
    probs = jax.nn.softmax(logits / temperature, axis=-1)
    order = jnp.argsort(-probs, axis=-1)
    sorted_probs = jnp.take_along_axis(probs, order, axis=-1)
    cum = jnp.cumsum(sorted_probs, axis=-1)
    keep_sorted = cum <= p
    keep_sorted = keep_sorted.at[:, 0].set(True)
    # scatter the keep mask back to class order
    keep = jnp.take_along_axis(
        keep_sorted, jnp.argsort(order, axis=-1), axis=-1)
    filtered = jnp.where(keep, probs, 0.0)
    filtered = filtered / jnp.sum(filtered, axis=-1, keepdims=True)
    return jax.random.categorical(rng, jnp.log(jnp.maximum(filtered, 1e-38)),
                                  axis=-1)

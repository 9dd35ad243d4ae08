"""Device-side postprocess ops: confidence gate, median filter on ids.

The reference runs its postprocess chain on host NumPy after transferring
logits (infer.py:163-174, SURVEY.md §3.3 "north star"). Here the frame-level
chain — softmax confidence gate (infer.py:86-96) and median filter on label
ids (infer.py:170-171, quirk Q8: ordinal smoothing over arbitrary id order,
scipy reflect boundary) — runs on device so only final ids/offsets cross to
host once.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("o_id",))
def confidence_gate_ids(logits: jnp.ndarray, threshold: jnp.ndarray,
                        o_id: int) -> jnp.ndarray:
    """argmax ids with frames whose max softmax prob < threshold forced to the
    "O" id (reference infer.py:86-96 + re-encoding at infer.py:169/297).

    logits: [..., T, n_tags]; threshold: scalar. Frames *at* the threshold
    keep their label (reference uses strict ``<``).
    """
    probs = jax.nn.softmax(logits, axis=-1)
    max_probs = jnp.max(probs, axis=-1)
    pred_ids = jnp.argmax(probs, axis=-1)
    return jnp.where(max_probs < threshold, o_id, pred_ids)


@functools.partial(jax.jit, static_argnames=("size",))
def median_filter_ids(ids: jnp.ndarray, size: int) -> jnp.ndarray:
    """``scipy.ndimage.median_filter(ids, size=size)`` on the last axis.

    scipy semantics replicated exactly: reflect boundary ("d c b a | a b c d"),
    window origin centered with the extra tap on the left for even sizes, and
    rank ``size // 2`` of the sorted window (scipy's medfilt rank for both
    parities).
    """
    if size <= 1 or ids.ndim == 0:
        # 0-d: a 1-element window is the identity (scipy preserves shape)
        return ids
    left = size // 2
    right = size - 1 - left
    pad_spec = [(0, 0)] * (ids.ndim - 1) + [(left, right)]
    padded = jnp.pad(ids, pad_spec, mode="symmetric")  # scipy 'reflect'
    windows = jnp.stack([jax.lax.slice_in_dim(padded, k, k + ids.shape[-1],
                                              axis=-1)
                         for k in range(size)], axis=-1)  # [..., T, size]
    return jnp.sort(windows, axis=-1)[..., size // 2]

"""Device-side postprocess ops: confidence gate, median filter, BIO decode.

The reference runs its postprocess chain on host NumPy after transferring
logits (infer.py:163-174, SURVEY.md §3.3 "north star"). Here the frame-level
chain — softmax confidence gate (infer.py:86-96), median filter on label
ids (infer.py:170-171, quirk Q8: ordinal smoothing over arbitrary id order,
scipy reflect boundary), and the BIO→segments state machine (reference
utils.py:10-74) — runs on device, so a single host transfer carries the
final segment arrays.

The state machine is vectorized, not scanned: after any frame the "open
phoneme" state is set by the last non-pass-through frame (O clears it,
B-x/I-x set it to x, other tags keep it), recoverable with a cummax over
frame indices plus one gather; starts/closes are then (frame, previous
state) pairs and the open segment's start index is a running max over
start positions — all VPU-friendly elementwise/cumsum work, no
sequential loop.
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


@functools.partial(jax.jit, static_argnames=("size",))
def median_filter_ids_masked(ids: jnp.ndarray, size: int,
                             length: jnp.ndarray) -> jnp.ndarray:
    """``median_filter_ids`` honoring a TRUE length on a padded row.

    Equals ``median_filter_ids(ids[:length], size)`` on the first ``length``
    frames (scipy 'reflect'/symmetric boundary AT ``length``, not at the
    padded end — the batched folder path runs rows of different true
    lengths through one static shape). Frames ≥ length pass through.
    Symmetric reflection is computed modularly (period 2·length), exact
    even when the window exceeds the sequence. 1-D ids, scalar length.
    """
    if size <= 1 or ids.ndim == 0:
        return ids
    left = size // 2
    t = ids.shape[-1]
    i = jnp.arange(t)
    n = jnp.maximum(length, 1)
    cols = []
    for k in range(size):
        idx = i + (k - left)
        m = jnp.mod(idx, 2 * n)
        m = jnp.where(m >= n, 2 * n - 1 - m, m)
        cols.append(jnp.take(ids, m))
    win = jnp.stack(cols, axis=-1)
    out = jnp.sort(win, axis=-1)[..., size // 2]
    return jnp.where(i < length, out, ids)


# ---------------------------------------------------------------------------
# Device-side BIO → segments (reference utils.py:10-74 / labels.decode_bio_tags)
# ---------------------------------------------------------------------------

def bio_tables(label_list):
    """Per-label-id decode tables for ``extract_segments_ids``.

    Returns ``(kind, ph, ph_names)``: ``kind[id]`` ∈ {0: "O", 1: "B-",
    2: "I-", 3: any other tag}; ``ph[id]`` indexes ``ph_names`` (the
    deduplicated phoneme suffixes, so ``B-x`` and ``I-x`` share an index),
    −1 for non-BIO. Kind 3 is a PASS-THROUGH: the host decoder
    (labels.py:117-137, reference utils.py:10-74) closes only on the exact
    tag ``"O"`` and falls through its startswith chain on anything else,
    leaving the open segment open — so a stray non-BIO label (hand-edited
    phonemes.txt) must neither open nor close on device either.
    Host-side, once per label set.
    """
    import numpy as np
    ph_names = []
    ph_index = {}
    kind = np.zeros(len(label_list), np.int32)
    ph = np.full(len(label_list), -1, np.int32)
    for i, tag in enumerate(label_list):
        if tag.startswith("B-"):
            kind[i] = 1
        elif tag.startswith("I-"):
            kind[i] = 2
        elif tag == "O":
            continue
        else:
            kind[i] = 3
            continue
        name = tag[2:]
        if name not in ph_index:
            ph_index[name] = len(ph_names)
            ph_names.append(name)
        ph[i] = ph_index[name]
    return kind, ph, ph_names


@jax.jit
def extract_segments_ids(ids: jnp.ndarray, offsets: jnp.ndarray,
                         length: jnp.ndarray, kind_table: jnp.ndarray,
                         ph_table: jnp.ndarray):
    """Device-side BIO state machine → fixed-size segment arrays.

    Replicates ``labels.decode_bio_tags`` (reference utils.py:10-74) on
    label IDS: a segment closes on "O", on any "B-", or on an "I-" with a
    different phoneme; the end-of-sequence flush uses ``length - 1`` as the
    end index (quirk Q14). Boundary *times* are NOT computed here — the
    host multiplies ``(idx + offset) * frame_duration`` in float64 exactly
    as the reference does, so ``.lab`` byte parity survives (f32 device
    math would truncate differently through ``int(t * 1e7)``).

    Args: ids [T] int (post gate/median); offsets [T, 2] f32 (pass 0.5-fill
    for the no-offsets path); length: true frame count (≤ T);
    kind_table/ph_table from :func:`bio_tables`.

    Returns (start_idx [T] i32, end_idx [T] i32, ph_id [T] i32,
    start_off [T] f32, end_off [T] f32, count i32); entries ≥ count are
    padding. Segments appear in close order, flush last — the host decode's
    emission order.
    """
    t = ids.shape[0]
    idx = jnp.arange(t, dtype=jnp.int32)
    valid = idx < length
    kind = jnp.where(valid, kind_table[ids], 0)
    is_bio = (kind == 1) | (kind == 2)
    ph = jnp.where(is_bio, ph_table[ids], -1)
    # Open-phoneme state AFTER frame i: kind 3 (non-BIO pass-through) keeps
    # the previous state, so eff[i] is the state set by the last
    # non-pass-through frame ≤ i (B/I set it to their phoneme, O clears) —
    # a cummax over frame indices plus one gather, still no scan.
    sel = jnp.where(kind != 3, idx, -1)
    last_sel = jax.lax.cummax(sel)
    eff = jnp.where(last_sel >= 0, ph[jnp.clip(last_sel, 0, t - 1)], -1)
    prev = jnp.concatenate([jnp.full((1,), -1, eff.dtype), eff[:-1]])
    prev_active = prev != -1
    is_start = (kind == 1) | ((kind == 2) & (ph != prev))
    close_here = prev_active & valid & (
        (kind == 0) | (kind == 1) | ((kind == 2) & (ph != prev)))

    start_pos = jnp.where(is_start, idx, -1)
    run_start = jax.lax.cummax(start_pos)   # latest start so far
    run_start_prev = jnp.concatenate(
        [jnp.full((1,), -1, run_start.dtype), run_start[:-1]])

    # flush (quirk Q14): if a segment is still open at frame length-1,
    # close it with end index length-1.
    last = jnp.maximum(length - 1, 0)
    flush_on = (length > 0) & (eff[last] != -1)
    flush_start = run_start[last]

    # compact closes into [T]-sized outputs (≤ T segments by construction)
    n_closes = jnp.sum(close_here.astype(jnp.int32))
    pos = jnp.cumsum(close_here.astype(jnp.int32)) - 1
    tgt = jnp.where(close_here, pos, t)     # t = dump slot
    out_b = jnp.zeros(t + 1, jnp.int32).at[tgt].set(run_start_prev)
    out_e = jnp.zeros(t + 1, jnp.int32).at[tgt].set(idx)
    out_p = jnp.zeros(t + 1, jnp.int32).at[tgt].set(prev)
    flush_tgt = jnp.where(flush_on, n_closes, t)
    out_b = out_b.at[flush_tgt].set(flush_start)
    out_e = out_e.at[flush_tgt].set(last)
    out_p = out_p.at[flush_tgt].set(eff[last])
    out_b, out_e, out_p = out_b[:t], out_e[:t], out_p[:t]

    start_off = offsets[jnp.clip(out_b, 0, t - 1), 0]
    end_off = offsets[jnp.clip(out_e, 0, t - 1), 1]
    count = n_closes + flush_on.astype(jnp.int32)
    return out_b, out_e, out_p, start_off, end_off, count

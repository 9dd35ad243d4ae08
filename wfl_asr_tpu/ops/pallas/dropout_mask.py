"""Position-stable dropout mask for the flash-attention kernels.

The fused online-softmax kernels cannot use ``jax.random`` inside the
kernel body, and the backward kernels retile the [T, T] score matrix
differently from the forward — so the dropout decision for score element
(b, h, q, k) must be a pure function of those absolute indices and a
seed, identical no matter which tile evaluates it. ``keep_mask`` is that
function: a two-round xorshift-multiply integer hash (int32 arithmetic
only — Mosaic-friendly: wraparound add/mul, xor, and arithmetic shifts
whose sign-extension bits are masked off) mapped to a Bernoulli(1-rate)
keep decision via a 24-bit uniform compare.

torch-semantics attention dropout (what HF WavLM's ``attention_dropout``
and ``nn.MultiheadAttention(dropout=...)`` do in training) drops
SOFTMAX PROBABILITIES with inverted scaling and no row renormalization:

    A = keep * P / (1 - rate),   out = A @ v

Inside the online softmax this composes cleanly: the row normalizer
``l`` accumulates the UNDROPPED exp(s - m) (the softmax denominator is
unaffected by dropout), while the output accumulator takes the dropped
values. The backward identity delta_i = rowsum(dO_i * O_i) survives:
delta_i = sum_k P_ik D_ik (dO_i . v_k) = dO_i . (A v)_i = dO_i . O_i,
so the standard flash backward needs only two local edits —
dV uses the dropped probabilities, and dS = P * (D * (dO V^T) - delta).

The masks are deterministic given (seed, b, h, q, k); they do NOT
reproduce torch/jax.random bitstreams (no dropout implementation ever
matches another's mask bits — the A/B in docs/PERFORMANCE.md is the
distribution-level equivalence evidence).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

def _s32(c: int) -> int:
    """Signed-int32 representation of a uint32 constant (two's complement
    — int32 wraparound arithmetic == uint32 arithmetic mod 2^32)."""
    return c - (1 << 32) if c >= (1 << 31) else c


# odd 32-bit mixing constants (xxhash/murmur lineage), stored signed
_C_Q = _s32(0x9E3779B1)
_C_K = _s32(0x85EBCA77)
_C_B = _s32(0x27D4EB2F)
_C_H = _s32(0x165667B1)
_C_M1 = _s32(0x7FEB352D)
_C_M2 = _s32(0x846CA68B)


def _i32(x):
    return jnp.asarray(x).astype(jnp.int32)


def seed_arr(dropout_seed):
    """Replicated [1,1] int32 SMEM operand for the flash kernels
    (zeros when dropout is off)."""
    if dropout_seed is None:
        return jnp.zeros((1, 1), jnp.int32)
    return jnp.asarray(dropout_seed, jnp.int32).reshape(1, 1)


def uniform24(seed, b, h, q_idx, k_idx) -> jnp.ndarray:
    """24-bit uniform integer in [0, 2^24) per (seed, b, h, q, k).

    ``q_idx``/``k_idx`` broadcast against each other (e.g. [BQ,1] x
    [1,BK]); ``seed``/``b``/``h`` are scalars. All int32 ops; arithmetic
    right-shifts are masked so sign extension cannot leak into the mix.
    """
    u = (_i32(q_idx) * _i32(_C_Q) + _i32(k_idx) * _i32(_C_K)
         + _i32(seed) + _i32(b) * _i32(_C_B) + _i32(h) * _i32(_C_H))
    u = u ^ ((u >> 13) & 0x7FFFF)
    u = u * _i32(_C_M1)
    u = u ^ ((u >> 17) & 0x7FFF)
    u = u * _i32(_C_M2)
    u = u ^ ((u >> 16) & 0xFFFF)
    return u & 0xFFFFFF


def keep_threshold(rate: float) -> int:
    """Static int32 threshold: keep iff uniform24 >= rate * 2^24."""
    t = int(round(float(rate) * (1 << 24)))
    return max(0, min(t, 1 << 24))


def keep_mask_f32(seed, b, h, q_idx, k_idx, rate: float) -> jnp.ndarray:
    """Scaled keep mask (0 or 1/(1-rate)) as f32 — multiply onto the
    probabilities. ``rate`` is static (trace-time python float)."""
    thr = keep_threshold(rate)
    keep = uniform24(seed, b, h, q_idx, k_idx) >= thr
    return keep.astype(jnp.float32) * jnp.float32(1.0 / (1.0 - rate))


def attention_prob_dropout_reference(probs: jnp.ndarray, seed,
                                     rate: float) -> jnp.ndarray:
    """jnp oracle with the EXACT kernel mask: apply torch-semantics
    dropout to a [B, H, Tq, Tk] probability tensor. Test-only — the
    oracle the flash kernels' cotangents are pinned against
    (tests/test_flash_dropout.py). The production XLA strict path
    (models/layers.attention_core) uses jax.random dropout instead:
    same distribution, different mask bits."""
    bb, hh, tq, tk = probs.shape
    q_idx = jnp.arange(tq, dtype=jnp.int32)[:, None]
    k_idx = jnp.arange(tk, dtype=jnp.int32)[None, :]
    def per_head(b, h):
        return keep_mask_f32(seed, b, h, q_idx, k_idx, rate)
    masks = jax.vmap(lambda b: jax.vmap(lambda h: per_head(b, h))(
        jnp.arange(hh, dtype=jnp.int32)))(jnp.arange(bb, dtype=jnp.int32))
    return (probs * masks.astype(probs.dtype))

"""Differentiable flash attention (Pallas fwd + bwd kernels, no-bias case).

``flash_attention_trainable(q, k, v, kv_len)`` is a ``jax.custom_vjp`` op:

- forward: online-softmax kernel that additionally writes the per-row
  logsumexp L (FlashAttention-2 style residual),
- backward: two Pallas kernels — dK/dV over key blocks and dQ over query
  blocks — recomputing P = exp(S − L) tile-by-tile, so no [B,H,T,T] tensor
  is ever materialized in either direction.

Used by the Whisper encoder and Conformer blocks (training AND inference —
the forward kernel here is also the serving path for those modules). WavLM
training instead runs ``flash_attention.flash_attention`` whose VJP
additionally produces the gated-relative-position-bias gradients
(dBias/dGate); this module stays the lean no-bias specialization with its
own (smaller) backward tile policy.

Deliberately NOT merged with flash_attention.py's kernels: the two dK/dV
passes want opposite grid orders. With a bias operand, batch must be the
innermost grid axis so the [T, BLOCK_K] bias block stays VMEM-resident
across batch revisits (grid (h, k, b) there); without one, the k-tile is
the natural innermost axis so the full-T q/dO/lse/delta streams are reused
across k iterations (grid (h, b, k) here). A merged kernel would need
grid-order parametrization — i.e. both code paths anyway. Any future
unification must A/B the real train step on chip (docs/ROADMAP.md).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .flash_attention import (DEFAULT_BLOCK_K, DEFAULT_BLOCK_Q,
                              _interpret, divisor_block)

NEG_INF = -1e30


# ---------------------------------------------------------------------------
# Forward (writes O and logsumexp L)
# ---------------------------------------------------------------------------

def _fwd_kernel(q_ref, k_ref, v_ref, kvlen_ref, seed_ref, o_ref, lse_ref, *,
                block_k: int, sm_scale: float, t_pad: int,
                dropout_rate: float):
    block_q, d = q_ref.shape[2], q_ref.shape[3]
    kv_len = kvlen_ref[0, 0, 0]
    q = q_ref[0, 0].astype(jnp.float32) * sm_scale
    # dropout (torch attention-prob semantics): the row normalizer l
    # accumulates the UNDROPPED p — the softmax denominator is unaffected
    # by dropout — while the output accumulator takes the dropped values
    # (see ops/pallas/dropout_mask.py for the math + mask contract).
    if dropout_rate > 0.0:
        seed = seed_ref[0, 0]
        bi, hi = pl.program_id(2), pl.program_id(0)
        q_idx = (pl.program_id(1) * block_q
                 + jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0))

    def body(i, carry):
        m_prev, l_prev, acc = carry
        k_start = pl.multiple_of(i * block_k, block_k)
        k_blk = k_ref[0, 0, pl.ds(k_start, block_k), :].astype(jnp.float32)
        v_blk = v_ref[0, 0, pl.ds(k_start, block_k), :]
        s = jax.lax.dot_general(q, k_blk, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        k_idx = k_start + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1)
        s = jnp.where(k_idx < kv_len, s, NEG_INF)
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        if dropout_rate > 0.0:
            from .dropout_mask import keep_mask_f32
            p = p * keep_mask_f32(seed, bi, hi, q_idx, k_idx, dropout_rate)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return m_new, l_new, acc

    m0 = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc0 = jnp.zeros((block_q, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, t_pad // block_k, body, (m0, l0, acc0))

    o_ref[0, 0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
    # lane-broadcast [BQ,128] write; the wrapper slices lane 0 so the
    # fwd→bwd residual is a compact [B,H,T] (a trailing dim of 1 would be
    # padded to the 128-lane tile in HBM — 128× memory held per layer;
    # see flash_attention._flash_kernel's lse note).
    lse = m + jnp.log(jnp.maximum(l, 1e-30))             # [BLOCK_Q, 1]
    lse_ref[0, 0] = jnp.broadcast_to(lse, (block_q, 128))


# ---------------------------------------------------------------------------
# Backward: dK/dV (grid over key blocks) and dQ (grid over query blocks)
# ---------------------------------------------------------------------------

def _bwd_dkdv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                     kvlen_ref, seed_ref, dk_ref, dv_ref, *,
                     block_q: int, sm_scale: float, t_pad: int,
                     dropout_rate: float):
    block_k, d = k_ref.shape[2], k_ref.shape[3]
    kv_len = kvlen_ref[0, 0, 0]
    kb_start = pl.program_id(2) * block_k

    k_blk = k_ref[0, 0].astype(jnp.float32)
    v_blk = v_ref[0, 0].astype(jnp.float32)
    k_idx = kb_start + jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1)
    k_valid = (k_idx < kv_len).astype(jnp.float32)            # [1, BK]
    if dropout_rate > 0.0:
        seed = seed_ref[0, 0]
        bi, hi = pl.program_id(1), pl.program_id(0)

    def body(i, carry):
        dk_acc, dv_acc = carry
        q_start = pl.multiple_of(i * block_q, block_q)
        q_blk = q_ref[0, 0, pl.ds(q_start, block_q), :].astype(jnp.float32)
        do_blk = do_ref[0, 0, pl.ds(q_start, block_q), :].astype(jnp.float32)
        lse = lse_ref[0, 0, pl.ds(q_start, block_q), :]     # [BQ, 128]
        delta = delta_ref[0, 0, pl.ds(q_start, block_q), :]  # [BQ, 1]

        s = jax.lax.dot_general(q_blk * sm_scale, k_blk,
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        # Mask scores BEFORE the exp (like the forward): a padded key
        # column's raw score can satisfy s - lse > 88, and exp→inf times
        # a 0 mask is NaN — which would poison every gradient.
        s = jnp.where(k_valid > 0, s, NEG_INF)
        p = jnp.exp(s - jnp.tile(lse, (1, block_k // 128)))   # [BQ, BK]
        if dropout_rate > 0.0:
            # dV uses the DROPPED probabilities; dS = P*(D*(dO V^T) - delta)
            # — delta = rowsum(dO*O) is invariant (dropout_mask.py docs).
            from .dropout_mask import keep_mask_f32
            q_idx = q_start + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, 1), 0)
            keepf = keep_mask_f32(seed, bi, hi, q_idx,
                                  kb_start + jax.lax.broadcasted_iota(
                                      jnp.int32, (block_q, block_k), 1),
                                  dropout_rate)
        else:
            keepf = None
        dv_acc = dv_acc + jax.lax.dot_general(
            p * keepf if keepf is not None else p, do_blk,
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do_blk, v_blk, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        if keepf is not None:
            dp = dp * keepf
        ds = p * (dp - delta) * sm_scale                      # [BQ, BK]
        dk_acc = dk_acc + jax.lax.dot_general(
            ds, q_blk, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return dk_acc, dv_acc

    dk0 = jnp.zeros((block_k, d), jnp.float32)
    dv0 = jnp.zeros((block_k, d), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, t_pad // block_q, body, (dk0, dv0))
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                   kvlen_ref, seed_ref, dq_ref, *,
                   block_k: int, sm_scale: float, t_pad: int,
                   dropout_rate: float):
    block_q, d = q_ref.shape[2], q_ref.shape[3]
    kv_len = kvlen_ref[0, 0, 0]
    q = q_ref[0, 0].astype(jnp.float32)
    do_blk = do_ref[0, 0].astype(jnp.float32)
    lse = lse_ref[0, 0]       # [BLOCK_Q, 128] lane-broadcast
    delta = delta_ref[0, 0]   # [BLOCK_Q, 1]
    if dropout_rate > 0.0:
        seed = seed_ref[0, 0]
        bi, hi = pl.program_id(2), pl.program_id(0)
        q_idx = (pl.program_id(1) * block_q
                 + jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0))

    def body(i, dq_acc):
        k_start = pl.multiple_of(i * block_k, block_k)
        k_blk = k_ref[0, 0, pl.ds(k_start, block_k), :].astype(jnp.float32)
        v_blk = v_ref[0, 0, pl.ds(k_start, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(q * sm_scale, k_blk,
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        k_idx = k_start + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1)
        # mask before exp — see _bwd_dkdv_kernel
        s = jnp.where(k_idx < kv_len, s, NEG_INF)
        p = jnp.exp(s - jnp.tile(lse, (1, block_k // 128)))
        dp = jax.lax.dot_general(do_blk, v_blk, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        if dropout_rate > 0.0:
            from .dropout_mask import keep_mask_f32
            dp = dp * keep_mask_f32(seed, bi, hi, q_idx, k_idx,
                                    dropout_rate)
        ds = p * (dp - delta) * sm_scale
        return dq_acc + jax.lax.dot_general(
            ds, k_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    dq = jax.lax.fori_loop(0, t_pad // block_k, body,
                           jnp.zeros((block_q, d), jnp.float32))
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------

def _pad_inputs(q, k, v, kv_len, block_q, block_k):
    b, h, t, d = q.shape
    t_pad = max(-(-t // block_q) * block_q, -(-t // block_k) * block_k)
    t_pad = -(-t_pad // block_q) * block_q
    t_pad = -(-t_pad // block_k) * block_k
    pad = [(0, 0), (0, 0), (0, t_pad - t), (0, 0)]
    qp, kp, vp = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    if kv_len is None:
        kv_arr = jnp.full((b,), t, jnp.int32)
    else:
        # clamp to ≥1 — see flash_attention._prep_inputs
        kv_arr = jnp.maximum(
            jnp.broadcast_to(jnp.asarray(kv_len, jnp.int32), (b,)), 1)
    return qp, kp, vp, kv_arr.reshape(b, 1, 1), t_pad




def _fwd_impl(q, k, v, kv_len, seed, block_q, block_k, dropout_rate):
    b, h, t, d = q.shape
    qp, kp, vp, kv_arr, t_pad = _pad_inputs(q, k, v, kv_len, block_q, block_k)
    grid = (h, t_pad // block_q, b)
    kernel = functools.partial(_fwd_kernel, block_k=block_k,
                               sm_scale=1.0 / np.sqrt(d), t_pad=t_pad,
                               dropout_rate=dropout_rate)
    out, lse = pl.pallas_call(
        kernel, grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda hi, qi, bi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t_pad, d), lambda hi, qi, bi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t_pad, d), lambda hi, qi, bi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda hi, qi, bi: (bi, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda hi, qi, bi: (0, 0),
                         memory_space=pltpu.SMEM),      # dropout seed
        ],
        out_specs=(
            pl.BlockSpec((1, 1, block_q, d), lambda hi, qi, bi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q, 128),
                         lambda hi, qi, bi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((b, h, t_pad, d), q.dtype),
                   jax.ShapeDtypeStruct((b, h, t_pad, 128), jnp.float32)),
        interpret=_interpret(),
    )(qp, kp, vp, kv_arr, seed)
    return out[:, :, :t], lse[:, :, :t, 0]


def flash_attention_trainable(q, k, v, kv_len=None,
                              block_q: Optional[int] = None,
                              block_k: Optional[int] = None,
                              mesh=None,
                              dropout_rate: float = 0.0,
                              dropout_seed=None):
    """Differentiable fused attention (no bias). q/k/v: [B,H,T,D].

    ``mesh``: run the kernels per-shard under shard_map over a
    ('data','model') mesh (batch on 'data', heads on 'model') —
    see flash_attention.shard_wrap.

    ``dropout_rate``/``dropout_seed``: IN-KERNEL attention-probability
    dropout with torch semantics (inverted dropout on the softmax output,
    rows not renormalized — what ``nn.MultiheadAttention(dropout=...)``
    does in training). The mask is a pure hash of (seed, b, h, q, k)
    (ops/pallas/dropout_mask.py) so the backward kernels regenerate it
    exactly at any tiling — no [B,H,T,T] mask is ever materialized, which
    is the whole point: strict-semantics dropout training keeps the flash
    path's memory ceiling. ``dropout_rate`` must be a static float;
    ``dropout_seed`` is a traced int32 scalar (derive it from the step's
    PRNG key). rate == 0.0 compiles to exactly the old kernels.

    Defaults are the serving-sweep optimum shared with flash_attention
    (full-row k blocks = single-pass softmax, wide q tiles). Blocks shrink
    automatically for wide heads: the backward kernels keep full-T q/dO
    (dK/dV pass) and k/v (dQ pass) streams in VMEM, so at D ≥ 256
    (Conformer heads over a 768-wide trunk) wide blocks exceed the ~16 MB
    VMEM budget (measured: scoped-vmem OOM at [8,2,1536,384] f32).
    """
    t, d = q.shape[2], q.shape[3]
    block_q = DEFAULT_BLOCK_Q if block_q is None else block_q
    block_k = DEFAULT_BLOCK_K if block_k is None else block_k
    dropout_rate = float(dropout_rate)
    if dropout_rate > 0.0 and dropout_seed is None:
        raise ValueError("dropout_rate > 0 requires dropout_seed")
    from .dropout_mask import seed_arr
    seed = seed_arr(dropout_seed)
    if d >= 256:
        # Wide heads: full-T k/v streams scale with D. bf16 inference
        # still affords 256-row q tiles with full-row k; f32 needs 128s
        # (the backward clamps itself separately in _vjp_bwd).
        if q.dtype == jnp.bfloat16:
            block_q = min(block_q, 256)
        else:
            block_q = min(block_q, 128)
            block_k = min(block_k, 128)
    t_pad = -(-t // 128) * 128
    block_q = divisor_block(block_q, 8, t_pad)
    block_k = divisor_block(block_k, 128, t_pad)
    if mesh is not None and mesh.size > 1:
        from jax.sharding import PartitionSpec as P
        from .flash_attention import shard_wrap
        hax = "model" if mesh.shape.get("model", 1) > 1 else None

        def core(q_, k_, v_, l_, s_):
            if dropout_rate > 0.0:
                # The kernels see shard-LOCAL b/h indices; the hash
                # pre-mix is linear in b/h, so offsetting the seed by the
                # shard's global index origin (local_size * axis_index *
                # the b/h mix constants) makes the mesh masks BIT-
                # IDENTICAL to the unsharded call's — see the matching
                # note in flash_attention.py.
                from .dropout_mask import _C_B, _C_H
                s_ = s_ + (jax.lax.axis_index("data").astype(jnp.int32)
                           * jnp.int32(q_.shape[0]) * jnp.int32(_C_B))
                if hax is not None:
                    s_ = s_ + (jax.lax.axis_index(hax).astype(jnp.int32)
                               * jnp.int32(q_.shape[1]) * jnp.int32(_C_H))
            return _flash_trainable_core(q_, k_, v_, l_, s_,
                                         block_q, block_k, dropout_rate)

        fn = shard_wrap(core, mesh, per_arg_specs=(
            P("data", hax, None, None), P("data", hax, None, None),
            P("data", hax, None, None),
            P("data") if kv_len is not None else None,
            P()))
        return fn(q, k, v, kv_len, seed)
    return _flash_trainable_core(q, k, v, kv_len, seed,
                                 block_q, block_k, dropout_rate)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _flash_trainable_core(q, k, v, kv_len, seed, block_q, block_k,
                          dropout_rate):
    out, _ = _fwd_impl(q, k, v, kv_len, seed, block_q, block_k,
                       dropout_rate)
    return out


def _vjp_fwd(q, k, v, kv_len, seed, block_q, block_k, dropout_rate):
    out, lse = _fwd_impl(q, k, v, kv_len, seed, block_q, block_k,
                         dropout_rate)
    return out, (q, k, v, kv_len, seed, out, lse)


def _vjp_bwd(block_q, block_k, dropout_rate, residuals, g):
    q, k, v, kv_len, seed, out, lse = residuals
    b, h, t, d = q.shape
    # The bwd keeps full-T streams in VMEM; shrink wide forward tiles to
    # its own divisor-aligned budget and re-pad the saved lse accordingly
    # (zero rows are inert: padded q rows have s=0 → p=1, dO=0).
    t_pad128 = -(-t // 128) * 128
    if d >= 256:
        # full-T q/dO (dK/dV) and k/v (dQ) streams at 4 B/elem: wide-head
        # backwards need 128s (measured scoped-vmem OOM at (256,512) f32).
        block_q = divisor_block(min(block_q, 128), 8, t_pad128)
        block_k = divisor_block(min(block_k, 128), 128, t_pad128)
    else:
        import os
        bq_cap = int(os.environ.get("WFL_FLASH_BWD_BQ", "256"))
        bk_cap = int(os.environ.get("WFL_FLASH_BWD_BK", "512"))
        block_q = divisor_block(min(block_q, bq_cap), 8, t_pad128)
        block_k = divisor_block(min(block_k, bk_cap), 128, t_pad128)
    qp, kp, vp, kv_arr, t_pad = _pad_inputs(q, k, v, kv_len, block_q, block_k)
    pad = [(0, 0), (0, 0), (0, t_pad - t), (0, 0)]
    # lse arrives as the compact [B,H,t] residual; re-pad and lane-broadcast
    # back to the kernels' [B,H,T_pad,128] convention (transient only).
    lse = jax.lax.broadcast_in_dim(jnp.pad(lse, pad[:3]),
                                   (q.shape[0], q.shape[1], t_pad, 128),
                                   (0, 1, 2))
    do = jnp.pad(g, pad)
    op = jnp.pad(out, pad)
    # delta = rowsum(dO * O), kept 4-D [B,H,T,1] for TPU block tiling
    delta = jnp.sum(do.astype(jnp.float32) * op.astype(jnp.float32),
                    axis=-1, keepdims=True)

    sm_scale = 1.0 / np.sqrt(d)

    dkv = pl.pallas_call(
        functools.partial(_bwd_dkdv_kernel, block_q=block_q,
                          sm_scale=sm_scale, t_pad=t_pad,
                          dropout_rate=dropout_rate),
        grid=(h, b, t_pad // block_k),
        in_specs=[
            pl.BlockSpec((1, 1, t_pad, d), lambda hi, bi, ki: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, d), lambda hi, bi, ki: (bi, hi, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, d), lambda hi, bi, ki: (bi, hi, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t_pad, d), lambda hi, bi, ki: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t_pad, 128),  # lse, lane-broadcast
                         lambda hi, bi, ki: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t_pad, 1), lambda hi, bi, ki: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda hi, bi, ki: (bi, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda hi, bi, ki: (0, 0),
                         memory_space=pltpu.SMEM),      # dropout seed
        ],
        out_specs=(
            pl.BlockSpec((1, 1, block_k, d), lambda hi, bi, ki: (bi, hi, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, d), lambda hi, bi, ki: (bi, hi, ki, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((b, h, t_pad, d), q.dtype),
                   jax.ShapeDtypeStruct((b, h, t_pad, d), q.dtype)),
        interpret=_interpret(),
    )(qp, kp, vp, do, lse, delta, kv_arr, seed)
    dk, dv = dkv

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, block_k=block_k,
                          sm_scale=sm_scale, t_pad=t_pad,
                          dropout_rate=dropout_rate),
        grid=(h, t_pad // block_q, b),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda hi, qi, bi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t_pad, d), lambda hi, qi, bi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t_pad, d), lambda hi, qi, bi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q, d), lambda hi, qi, bi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q, 128),  # lse, lane-broadcast
                         lambda hi, qi, bi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q, 1),
                         lambda hi, qi, bi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda hi, qi, bi: (bi, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda hi, qi, bi: (0, 0),
                         memory_space=pltpu.SMEM),      # dropout seed
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d),
                               lambda hi, qi, bi: (bi, hi, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, t_pad, d), q.dtype),
        interpret=_interpret(),
    )(qp, kp, vp, do, lse, delta, kv_arr, seed)

    return dq[:, :, :t], dk[:, :, :t], dv[:, :, :t], None, None


_flash_trainable_core.defvjp(_vjp_fwd, _vjp_bwd)

"""Fused flash attention (Pallas/TPU) with additive bias and per-query gate,
differentiable end to end (dQ/dK/dV/dBias/dGate).

Motivation (measured, scripts/ablate_encoder.py): XLA attention at WavLM
shapes (T=1499) materializes [B,H,T,T] score/probability tensors in HBM —
~3 GB of traffic per layer — putting the encoder ~7× off roofline. This
kernel runs the online-softmax attention tile-by-tile in VMEM:

    out[b,h,q,:] = softmax_k( q·kᵀ/√d  +  gate[b,h,q] · bias[h,q,k] ) · v

- ``bias`` [H, T, T] is the layer-shared WavLM relative position bias; tiles
  are streamed from HBM (108 MB read once per layer instead of gigabytes of
  materialized score tensors). ``gate`` [B, H, T] is WavLM's per-query gate;
  pass ``None`` for plain attention (Whisper / Conformer).
- ``kv_len`` masks padded key positions (righthand bucket padding).
- f32 accumulation for scores/softmax; bf16 everywhere else.

Differentiation uses a ``jax.custom_vjp``: the forward-for-grad pass also
writes the per-row logsumexp (FlashAttention-2 residual); the backward runs
two Pallas kernels that recompute P = exp(S − L) tile-by-tile —

- dK/dV over key blocks (grid (h, b, k)), re-applying the gated bias to the
  recomputed scores;
- dQ / dGate / dBias over query blocks (grid (h, q, b) with batch innermost):
  dGate[b,h,q] = Σ_k bias·dS, and dBias[h,q,k] = Σ_b gate·dS accumulated
  across the batch grid axis into a revisited output block, so the [H,T,T]
  bias cotangent is produced without any [B,H,T,T] materialization. XLA then
  backprops it through the bucket gather onto the rel-position embedding.

This is what lets WavLM *training* (reference train.py:188-270 hot path,
gated bias defined in model.py:72-81 via HF WavLM) run on the fused kernel
instead of XLA attention.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

# Serving-path sweep at WavLM-base B=8×30 s (T=1499), docs/PERFORMANCE.md:
# full-row k blocks (single-pass softmax, no online rescans) + 768-row q
# tiles: 2888 → 3059 RTFx. Values are upper bounds; the wrapper shrinks
# them to divisor-aligned blocks per shape.
DEFAULT_BLOCK_Q = int(os.environ.get("WFL_FLASH_BQ", "768"))
DEFAULT_BLOCK_K = int(os.environ.get("WFL_FLASH_BK", "1536"))
NEG_INF = -1e30


def divisor_block(bound: int, granule: int, t_pad: int) -> int:
    """Largest tile-aligned block ≤ bound that divides the padded length
    (granule 8 for sublane dims, 128 for lane dims; a divisor always
    exists because t_pad is a multiple of both granules)."""
    d = min(bound, t_pad) // granule * granule
    while d > granule and t_pad % d:
        d -= granule
    return max(d, granule)


def _interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _flash_kernel(q_ref, k_ref, v_ref, bias_ref, gate_ref, kvlen_ref,
                  seed_ref, o_ref, *maybe_lse_ref, block_k: int,
                  sm_scale: float, t_pad: int, has_bias: bool,
                  has_gate: bool, dropout_rate: float = 0.0):
    # Blocks carry leading singleton (batch, head) dims:
    # q_ref: [1,1,BLOCK_Q,D]; k_ref/v_ref: [1,1,T_pad,D];
    # bias_ref: [1,BLOCK_Q,T_pad]; gate_ref: [1,1,BLOCK_Q,1];
    # kvlen_ref: [1,1,1] (SMEM); o_ref: [1,1,BLOCK_Q,D];
    # maybe_lse_ref: ([1,1,BLOCK_Q,128],) when the caller wants the
    # logsumexp — lane-BROADCAST (every lane equal), the same convention as
    # jax.experimental.pallas.ops.tpu.flash_attention. The wrapper slices
    # lane 0 so the fwd→bwd residual is a compact [B,H,T] f32 array: a
    # trailing dim of 1 would be physically padded to the 128-lane tile in
    # HBM (128× memory), and with one lse per layer held until the
    # backward that padding OOM'd wavlm-large training (B=4×30 s, r4 log
    # docs/TPU_RUNS_r04.log).
    block_q, d = q_ref.shape[2], q_ref.shape[3]
    kv_len = kvlen_ref[0, 0, 0]

    q = q_ref[0, 0].astype(jnp.float32) * sm_scale
    if has_gate:
        gate = gate_ref[0, 0].astype(jnp.float32)          # [BLOCK_Q, 1]
    # in-kernel attention-prob dropout (torch semantics): l accumulates
    # the UNDROPPED p (softmax denominator is unaffected), the output
    # accumulator takes the dropped values — ops/pallas/dropout_mask.py.
    if dropout_rate > 0.0:
        seed = seed_ref[0, 0]
        d_bi, d_hi = pl.program_id(2), pl.program_id(0)
        q_idx = (pl.program_id(1) * block_q
                 + jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0))

    def body(i, carry):
        m_prev, l_prev, acc = carry
        k_start = pl.multiple_of(i * block_k, block_k)
        k_blk = k_ref[0, 0, pl.ds(k_start, block_k), :].astype(jnp.float32)
        v_blk = v_ref[0, 0, pl.ds(k_start, block_k), :]

        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)            # [BQ, BK]
        if has_bias:
            b_blk = bias_ref[0, :, pl.ds(k_start, block_k)] \
                .astype(jnp.float32)
            s = s + (gate * b_blk if has_gate else b_blk)

        k_idx = k_start + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1)
        s = jnp.where(k_idx < kv_len, s, NEG_INF)

        # Measured: running the softmax arithmetic in bf16 is ~3% SLOWER
        # end to end (3056 vs 3149 RTFx) — the dtype casts cost more than
        # the bf16 VPU ops save. Softmax stays f32.
        m_cur = jnp.max(s, axis=1, keepdims=True)          # [BQ, 1]
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)                             # [BQ, BK]
        l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        if dropout_rate > 0.0:
            from .dropout_mask import keep_mask_f32
            p = p * keep_mask_f32(seed, d_bi, d_hi, q_idx, k_idx,
                                  dropout_rate)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return m_new, l_new, acc

    m0 = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc0 = jnp.zeros((block_q, d), jnp.float32)
    num_k_blocks = t_pad // block_k
    m, l, acc = jax.lax.fori_loop(0, num_k_blocks, body, (m0, l0, acc0))

    o_ref[0, 0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
    if maybe_lse_ref:
        lse = m + jnp.log(jnp.maximum(l, 1e-30))           # [BQ, 1]
        maybe_lse_ref[0][0, 0] = jnp.broadcast_to(lse, (block_q, 128))


def _prep_inputs(q, k, v, bias, gate, kv_len, block_q, block_k):
    """Pad time to a common multiple of both block sizes; densify optionals."""
    b, h, t, d = q.shape
    out_dtype = q.dtype
    t_pad = max(-(-t // block_q) * block_q, -(-t // block_k) * block_k)
    t_pad = -(-t_pad // block_q) * block_q
    t_pad = -(-t_pad // block_k) * block_k

    pad_t = [(0, 0), (0, 0), (0, t_pad - t), (0, 0)]
    qp, kp, vp = jnp.pad(q, pad_t), jnp.pad(k, pad_t), jnp.pad(v, pad_t)

    if bias is not None:
        # Store the bias at the activation dtype (bf16 halves its HBM
        # traffic); the kernels accumulate scores in f32 regardless.
        bias_p = jnp.pad(bias.astype(out_dtype),
                         [(0, 0), (0, t_pad - t), (0, t_pad - t)])
    else:
        bias_p = jnp.zeros((1, 1, 1), out_dtype)
    if gate is not None:
        gate_p = jnp.pad(gate, [(0, 0), (0, 0), (0, t_pad - t)])[..., None]
    else:
        gate_p = jnp.zeros((1, 1, 1, 1), out_dtype)

    if kv_len is None:
        kv_arr = jnp.full((b,), t, jnp.int32)
    else:
        # Clamp to ≥1: a kv_len==0 row (empty utterance) would make every
        # block fully masked, m_new stays at the finite NEG_INF sentinel
        # and p = exp(s − m_new) = 1 for all keys — the output would be a
        # garbage average of padded v rows. Attending to key 0 alone keeps
        # the row finite and deterministic; its output is padding anyway.
        kv_arr = jnp.maximum(
            jnp.broadcast_to(jnp.asarray(kv_len, jnp.int32), (b,)), 1)
    return qp, kp, vp, bias_p, gate_p, kv_arr.reshape(b, 1, 1), t_pad


def _fwd_impl(q, k, v, bias, gate, kv_len, seed, block_q, block_k,
              want_lse, dropout_rate=0.0):
    b, h, t, d = q.shape
    has_bias, has_gate = bias is not None, gate is not None
    out_dtype = q.dtype
    qp, kp, vp, bias_p, gate_p, kv_arr, t_pad = _prep_inputs(
        q, k, v, bias, gate, kv_len, block_q, block_k)

    # Grid order (h, q, b): batch innermost so the (head, q-tile) bias block
    # stays VMEM-resident across batch iterations — bias HBM traffic is
    # [H,T,T] once per layer instead of once per (layer, batch element).
    grid = (h, t_pad // block_q, b)

    kernel = functools.partial(
        _flash_kernel, block_k=block_k, sm_scale=1.0 / np.sqrt(d),
        t_pad=t_pad, has_bias=has_bias, has_gate=has_gate,
        dropout_rate=dropout_rate)

    out_specs = pl.BlockSpec((1, 1, block_q, d),
                             lambda hi, qi, bi: (bi, hi, qi, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((b, h, t_pad, d), out_dtype)
    if want_lse:
        out_specs = (out_specs,
                     pl.BlockSpec((1, 1, block_q, 128),
                                  lambda hi, qi, bi: (bi, hi, qi, 0),
                                  memory_space=pltpu.VMEM))
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((b, h, t_pad, 128), jnp.float32))

    res = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d),
                         lambda hi, qi, bi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t_pad, d),
                         lambda hi, qi, bi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t_pad, d),
                         lambda hi, qi, bi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, t_pad) if has_bias else (1, 1, 1),
                         (lambda hi, qi, bi: (hi, qi, 0)) if has_bias
                         else (lambda hi, qi, bi: (0, 0, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q, 1) if has_gate else (1, 1, 1, 1),
                         (lambda hi, qi, bi: (bi, hi, qi, 0)) if has_gate
                         else (lambda hi, qi, bi: (0, 0, 0, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda hi, qi, bi: (bi, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda hi, qi, bi: (0, 0),
                         memory_space=pltpu.SMEM),      # dropout seed
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        # interpret mode on non-TPU backends (tests on the CPU platform)
        interpret=_interpret(),
    )(qp, kp, vp, bias_p, gate_p, kv_arr, seed)

    if want_lse:
        out, lse = res
        # lane 0 of the broadcast block → compact [B,H,t] residual
        return out[:, :, :t, :], lse[:, :, :t, 0]
    return res[:, :, :t, :], None


# ---------------------------------------------------------------------------
# Backward kernels
# ---------------------------------------------------------------------------

def _bwd_dkdv_kernel(q_ref, k_ref, v_ref, bias_ref, gate_ref, do_ref,
                     lse_ref, delta_ref, kvlen_ref, seed_ref,
                     dk_ref, dv_ref, *,
                     block_q: int, sm_scale: float, t_pad: int,
                     has_bias: bool, has_gate: bool,
                     dropout_rate: float = 0.0):
    # grid (h, k, b) — batch innermost so the bias block stays resident.
    # q/do: [1,1,T_pad,D]; k/v: [1,1,BLOCK_K,D]; bias: [1,T_pad,BLOCK_K];
    # gate: [1,1,T_pad,1]; lse: [1,1,T_pad,128] lane-broadcast (see
    # _flash_kernel); delta: [1,1,T_pad,1].
    block_k, d = k_ref.shape[2], k_ref.shape[3]
    kv_len = kvlen_ref[0, 0, 0]
    kb_start = pl.program_id(1) * block_k

    k_blk = k_ref[0, 0].astype(jnp.float32)
    v_blk = v_ref[0, 0].astype(jnp.float32)
    k_idx = kb_start + jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1)
    k_valid = (k_idx < kv_len).astype(jnp.float32)            # [1, BK]
    if dropout_rate > 0.0:
        seed = seed_ref[0, 0]
        d_bi, d_hi = pl.program_id(2), pl.program_id(0)
        dk_idx = kb_start + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1)

    def body(i, carry):
        dk_acc, dv_acc = carry
        q_start = pl.multiple_of(i * block_q, block_q)
        q_blk = q_ref[0, 0, pl.ds(q_start, block_q), :].astype(jnp.float32)
        do_blk = do_ref[0, 0, pl.ds(q_start, block_q), :].astype(jnp.float32)
        lse = lse_ref[0, 0, pl.ds(q_start, block_q), :]       # [BQ, 128]
        delta = delta_ref[0, 0, pl.ds(q_start, block_q), :]   # [BQ, 1]

        s = jax.lax.dot_general(q_blk * sm_scale, k_blk,
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if has_bias:
            b_blk = bias_ref[0, pl.ds(q_start, block_q), :] \
                .astype(jnp.float32)                          # [BQ, BK]
            if has_gate:
                g = gate_ref[0, 0, pl.ds(q_start, block_q), :] \
                    .astype(jnp.float32)                      # [BQ, 1]
                s = s + g * b_blk
            else:
                s = s + b_blk
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
            keepf = keep_mask_f32(seed, d_bi, d_hi, q_idx, dk_idx,
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


def _bwd_dq_kernel(q_ref, k_ref, v_ref, bias_ref, gate_ref, do_ref,
                   lse_ref, delta_ref, kvlen_ref, seed_ref,
                   dq_ref, dgate_ref, dbias_ref, *,
                   block_k: int, sm_scale: float, t_pad: int,
                   has_bias: bool, has_gate: bool,
                   dropout_rate: float = 0.0):
    # grid (h, q, b), batch innermost. q/do/dq: [1,1,BLOCK_Q,D];
    # k/v: [1,1,T_pad,D]; bias/dbias: [1,BLOCK_Q,T_pad] (dbias revisited —
    # accumulated across the b axis); gate/dgate: [1,1,BLOCK_Q,1];
    # lse: [1,1,BLOCK_Q,128] lane-broadcast (see _flash_kernel).
    block_q, d = q_ref.shape[2], q_ref.shape[3]
    kv_len = kvlen_ref[0, 0, 0]
    bi = pl.program_id(2)
    q = q_ref[0, 0].astype(jnp.float32)
    do_blk = do_ref[0, 0].astype(jnp.float32)
    lse = lse_ref[0, 0]       # [BLOCK_Q, 128]
    delta = delta_ref[0, 0]   # [BLOCK_Q, 1]
    if has_gate:
        gate = gate_ref[0, 0].astype(jnp.float32)             # [BQ, 1]
    if dropout_rate > 0.0:
        seed = seed_ref[0, 0]
        d_hi = pl.program_id(0)
        dq_idx = (pl.program_id(1) * block_q
                  + jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0))

    def body(i, carry):
        dq_acc, dgate_acc = carry
        k_start = pl.multiple_of(i * block_k, block_k)
        k_blk = k_ref[0, 0, pl.ds(k_start, block_k), :].astype(jnp.float32)
        v_blk = v_ref[0, 0, pl.ds(k_start, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(q * sm_scale, k_blk,
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if has_bias:
            b_blk = bias_ref[0, :, pl.ds(k_start, block_k)] \
                .astype(jnp.float32)                          # [BQ, BK]
            s = s + (gate * b_blk if has_gate else b_blk)
        k_idx = k_start + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1)
        # mask before exp — see _bwd_dkdv_kernel
        s = jnp.where(k_idx < kv_len, s, NEG_INF)
        p = jnp.exp(s - jnp.tile(lse, (1, block_k // 128)))
        dp = jax.lax.dot_general(do_blk, v_blk, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        if dropout_rate > 0.0:
            # D*(dO V^T) — dBias/dGate flow through the same dS, so the
            # mask factor lands in all three cotangents consistently.
            from .dropout_mask import keep_mask_f32
            dp = dp * keep_mask_f32(seed, bi, d_hi, dq_idx, k_idx,
                                    dropout_rate)
        ds_raw = p * (dp - delta)                             # dS (unscaled)
        dq_acc = dq_acc + jax.lax.dot_general(
            ds_raw * sm_scale, k_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        if has_bias:
            # dBias[h,q,k] = Σ_b gate·dS: accumulate into the revisited
            # output block (batch is the innermost grid axis, so revisits
            # are consecutive and the block stays VMEM-resident).
            contrib = gate * ds_raw if has_gate else ds_raw
            prev = dbias_ref[0, :, pl.ds(k_start, block_k)]
            dbias_ref[0, :, pl.ds(k_start, block_k)] = (
                contrib + jnp.where(bi == 0, 0.0, prev))
            if has_gate:
                dgate_acc = dgate_acc + jnp.sum(
                    b_blk * ds_raw, axis=1, keepdims=True)    # [BQ, 1]
        return dq_acc, dgate_acc

    dq0 = jnp.zeros((block_q, d), jnp.float32)
    dg0 = jnp.zeros((block_q, 1), jnp.float32)
    dq, dgate = jax.lax.fori_loop(0, t_pad // block_k, body, (dq0, dg0))
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)
    if has_gate:
        dgate_ref[0, 0] = dgate.astype(dgate_ref.dtype)


def _bwd_impl(q, k, v, bias, gate, kv_len, seed, out, lse, g,
              block_q, block_k, dropout_rate=0.0):
    # ``lse`` arrives as the compact [B,H,t] residual (see _flash_kernel's
    # lse note) and is re-padded and lane-broadcast back to the kernels'
    # [B,H,T_pad,128] convention here — a transient, freed per layer, so
    # the broadcast costs no held memory. Zero-padding is inert because
    # padded rows have q=0/gate=0 → s=0 → p=exp(0-0)=1, multiplied by
    # dO=0 everywhere.
    b, h, t, d = q.shape
    has_bias, has_gate = bias is not None, gate is not None
    qp, kp, vp, bias_p, gate_p, kv_arr, t_pad = _prep_inputs(
        q, k, v, bias, gate, kv_len, block_q, block_k)
    pad = [(0, 0), (0, 0), (0, t_pad - t), (0, 0)]
    lse = jax.lax.broadcast_in_dim(jnp.pad(lse, pad[:3]),
                                   (b, h, t_pad, 128), (0, 1, 2))
    do = jnp.pad(g, pad)
    op = jnp.pad(out, pad)
    # delta = rowsum(dO · O), kept 4-D [B,H,T,1] for TPU block tiling.
    delta = jnp.sum(do.astype(jnp.float32) * op.astype(jnp.float32),
                    axis=-1, keepdims=True)
    sm_scale = 1.0 / np.sqrt(d)

    # Grid (h, k, b) with batch innermost: the (head, k-tile) bias block
    # stays VMEM-resident across batch iterations — bias HBM traffic in
    # the dK/dV pass is [H,T,T] once per layer instead of once per
    # (layer, batch element), mirroring the forward's grid order.
    def bias_spec_kblocked():
        if has_bias:
            return pl.BlockSpec((1, t_pad, block_k),
                                lambda hi, ki, bi: (hi, 0, ki),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec((1, 1, 1), lambda hi, ki, bi: (0, 0, 0),
                            memory_space=pltpu.VMEM)

    def gate_spec_full():
        if has_gate:
            return pl.BlockSpec((1, 1, t_pad, 1),
                                lambda hi, ki, bi: (bi, hi, 0, 0),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec((1, 1, 1, 1), lambda hi, ki, bi: (0, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkdv_kernel, block_q=block_q,
                          sm_scale=sm_scale, t_pad=t_pad,
                          has_bias=has_bias, has_gate=has_gate,
                          dropout_rate=dropout_rate),
        grid=(h, t_pad // block_k, b),
        in_specs=[
            pl.BlockSpec((1, 1, t_pad, d), lambda hi, ki, bi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, d), lambda hi, ki, bi: (bi, hi, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, d), lambda hi, ki, bi: (bi, hi, ki, 0),
                         memory_space=pltpu.VMEM),
            bias_spec_kblocked(),
            gate_spec_full(),
            pl.BlockSpec((1, 1, t_pad, d), lambda hi, ki, bi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t_pad, 128),  # lse, lane-broadcast
                         lambda hi, ki, bi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t_pad, 1), lambda hi, ki, bi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda hi, ki, bi: (bi, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda hi, ki, bi: (0, 0),
                         memory_space=pltpu.SMEM),      # dropout seed
        ],
        out_specs=(
            pl.BlockSpec((1, 1, block_k, d), lambda hi, ki, bi: (bi, hi, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, d), lambda hi, ki, bi: (bi, hi, ki, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((b, h, t_pad, d), q.dtype),
                   jax.ShapeDtypeStruct((b, h, t_pad, d), q.dtype)),
        interpret=_interpret(),
    )(qp, kp, vp, bias_p, gate_p, do, lse, delta, kv_arr, seed)

    def bias_spec_qblocked():
        if has_bias:
            return pl.BlockSpec((1, block_q, t_pad),
                                lambda hi, qi, bi: (hi, qi, 0),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec((1, 1, 1), lambda hi, qi, bi: (0, 0, 0),
                            memory_space=pltpu.VMEM)

    def gate_spec_qblocked():
        if has_gate:
            return pl.BlockSpec((1, 1, block_q, 1),
                                lambda hi, qi, bi: (bi, hi, qi, 0),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec((1, 1, 1, 1), lambda hi, qi, bi: (0, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    dbias_shape = (h, t_pad, t_pad) if has_bias else (1, 1, 1)
    dbias_spec = (pl.BlockSpec((1, block_q, t_pad),
                               lambda hi, qi, bi: (hi, qi, 0),
                               memory_space=pltpu.VMEM) if has_bias
                  else pl.BlockSpec((1, 1, 1), lambda hi, qi, bi: (0, 0, 0),
                                    memory_space=pltpu.VMEM))
    dgate_shape = (b, h, t_pad, 1) if has_gate else (1, 1, 1, 1)
    dgate_spec = (pl.BlockSpec((1, 1, block_q, 1),
                               lambda hi, qi, bi: (bi, hi, qi, 0),
                               memory_space=pltpu.VMEM) if has_gate
                  else pl.BlockSpec((1, 1, 1, 1),
                                    lambda hi, qi, bi: (0, 0, 0, 0),
                                    memory_space=pltpu.VMEM))

    dq, dgate, dbias = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, block_k=block_k,
                          sm_scale=sm_scale, t_pad=t_pad,
                          has_bias=has_bias, has_gate=has_gate,
                          dropout_rate=dropout_rate),
        grid=(h, t_pad // block_q, b),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda hi, qi, bi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t_pad, d), lambda hi, qi, bi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t_pad, d), lambda hi, qi, bi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            bias_spec_qblocked(),
            gate_spec_qblocked(),
            pl.BlockSpec((1, 1, block_q, d), lambda hi, qi, bi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q, 128),  # lse, lane-broadcast
                         lambda hi, qi, bi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q, 1), lambda hi, qi, bi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda hi, qi, bi: (bi, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda hi, qi, bi: (0, 0),
                         memory_space=pltpu.SMEM),      # dropout seed
        ],
        out_specs=(
            pl.BlockSpec((1, 1, block_q, d), lambda hi, qi, bi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            dgate_spec,
            dbias_spec,
        ),
        out_shape=(jax.ShapeDtypeStruct((b, h, t_pad, d), q.dtype),
                   jax.ShapeDtypeStruct(dgate_shape, jnp.float32),
                   jax.ShapeDtypeStruct(dbias_shape, jnp.float32)),
        interpret=_interpret(),
    )(qp, kp, vp, bias_p, gate_p, do, lse, delta, kv_arr, seed)

    dq = dq[:, :, :t]
    dk = dk[:, :, :t]
    dv = dv[:, :, :t]
    dbias_out = (dbias[:, :t, :t].astype(bias.dtype) if has_bias else None)
    dgate_out = (dgate[:, :, :t, 0].astype(gate.dtype) if has_gate else None)
    return dq, dk, dv, dbias_out, dgate_out


# ---------------------------------------------------------------------------
# custom_vjp wiring
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _flash_core(q, k, v, bias, gate, kv_len, seed, block_q, block_k,
                dropout_rate):
    out, _ = _fwd_impl(q, k, v, bias, gate, kv_len, seed, block_q, block_k,
                       want_lse=False, dropout_rate=dropout_rate)
    return out


def _flash_vjp_fwd(q, k, v, bias, gate, kv_len, seed, block_q, block_k,
                   dropout_rate):
    out, lse = _fwd_impl(q, k, v, bias, gate, kv_len, seed, block_q, block_k,
                         want_lse=True, dropout_rate=dropout_rate)
    return out, (q, k, v, bias, gate, kv_len, seed, out, lse)


def _flash_vjp_bwd(block_q, block_k, dropout_rate, residuals, g):
    q, k, v, bias, gate, kv_len, seed, out, lse = residuals
    t = q.shape[2]
    # The backward kernels keep more live state than the forward (full-T
    # q/dO and k/v streams; with a bias, tiles in BOTH orientations plus
    # the f32 dBias accumulator), so the serving-optimal forward tiles
    # (768×full-row) overflow VMEM here — measured 18.75 MB at bf16
    # B=8×30 s with bias, and full-row bwd k blocks OOM at 19.3 MB. Clamp
    # to measured-safe divisor-aligned blocks in every case (bias or not);
    # the saved lse is re-padded to the bwd padding. WFL_FLASH_BWD_BQ/BK
    # override the caps for tile sweeps (scripts/ablate_flash_bwd.py).
    t_pad = -(-t // 128) * 128
    # Round-3 tile sweep (scripts/ablate_flash_bwd.py): full-row k blocks
    # measure 3.55 vs 3.76 ms/pass standalone, but the dK/dV kernel then
    # allocates 19.33 MB scoped VMEM inside the real train-step graph and
    # fails to compile (16 MB limit) — standalone jit of the VJP squeaks
    # through, the train step does not. 768 measures no win (3.77). Keep
    # the measured-safe divisor-aligned caps; WFL_FLASH_BWD_BQ/BK override
    # for sweeps.
    bk_cap = 256 if (bias is not None and q.dtype != jnp.bfloat16) else 512
    bq_cap = int(os.environ.get("WFL_FLASH_BWD_BQ", "256"))
    bk_cap = int(os.environ.get("WFL_FLASH_BWD_BK", str(bk_cap)))
    block_q = divisor_block(min(block_q, bq_cap), 8, t_pad)
    block_k = divisor_block(min(block_k, bk_cap), 128, t_pad)
    dq, dk, dv, dbias, dgate = _bwd_impl(
        q, k, v, bias, gate, kv_len, seed, out, lse, g,
        block_q, block_k, dropout_rate=dropout_rate)
    return dq, dk, dv, dbias, dgate, None, None


_flash_core.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)


def shard_wrap(core, mesh, per_arg_specs, out_spec=None):
    """Wrap a Pallas kernel entry point in ``jax.shard_map`` over a
    ('data', 'model') mesh so each device runs the kernel on its local
    shard (Pallas custom calls are not GSPMD-partitionable — without this,
    any mesh had to fall back to pure-XLA graphs).

    ``per_arg_specs``: PartitionSpec (or pytree of specs) per positional
    arg; None entries (optional operands that are absent) get an inert
    P(). ``out_spec`` defaults to the first arg's spec. Replicated inputs
    (e.g. the shared position bias under pure DP) get their cotangents
    psum'd across the mesh automatically by shard_map's AD, which is what
    makes dBias/dGate correct under DP.
    """
    from jax.sharding import PartitionSpec  # local: keep module import-light
    specs = tuple(PartitionSpec() if s is None else s for s in per_arg_specs)
    return jax.shard_map(core, mesh=mesh, in_specs=specs,
                         out_specs=specs[0] if out_spec is None else out_spec,
                         check_vma=False)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "mesh",
                                             "dropout_rate"))
def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    bias: Optional[jnp.ndarray] = None,
                    gate: Optional[jnp.ndarray] = None,
                    kv_len: Optional[jnp.ndarray] = None,
                    block_q: int = DEFAULT_BLOCK_Q,
                    block_k: int = DEFAULT_BLOCK_K,
                    mesh=None,
                    dropout_rate: float = 0.0,
                    dropout_seed=None) -> jnp.ndarray:
    """q, k, v: [B, H, T, D] → [B, H, T, D]. Differentiable.

    bias: [H, T, T] (shared over batch) or None; gate: [B, H, T] or None
    (requires bias); kv_len: [B] valid key count (None = T).

    ``mesh``: a ('data','model') ``jax.sharding.Mesh`` — the kernel runs
    per-shard under shard_map (batch on 'data'; heads, and the bias's head
    dim, on 'model' when the mesh has a model axis), bit-identical to the
    unsharded call. B must divide the data axis; H the model axis.

    ``dropout_rate``/``dropout_seed``: IN-KERNEL attention-probability
    dropout with torch semantics (what HF WavLM's ``attention_dropout``
    applies in training) — the strict-semantics training path at the
    flash kernel's memory ceiling. The mask is a pure hash of
    (seed, b, h, q, k) regenerated identically by the backward kernels at
    any tiling (ops/pallas/dropout_mask.py); dBias/dGate flow through the
    same dropped dS. ``dropout_rate`` must be static; ``dropout_seed`` a
    traced int32 scalar. rate == 0.0 compiles to exactly the old kernels.
    """
    t = q.shape[2]
    if gate is not None and bias is None:
        raise ValueError("gate requires bias")
    dropout_rate = float(dropout_rate)
    if dropout_rate > 0.0 and dropout_seed is None:
        raise ValueError("dropout_rate > 0 requires dropout_seed")
    from .dropout_mask import seed_arr
    seed = seed_arr(dropout_seed)
    if q.shape[-1] >= 256:
        # Wide heads: the bwd kernels keep full-T streams in VMEM; shrink
        # blocks to stay inside the ~16 MB budget (see flash_attention_bwd).
        block_q = min(block_q, 128)
        block_k = min(block_k, 128)
    if bias is not None and q.dtype == jnp.float32:
        # f32 training: the [T, BLOCK_K] bias tile in the dK/dV kernel is
        # double-buffered at 4 B/elem; 512-wide blocks overflow VMEM by
        # ~50 KB at T=1536 (measured). 256 keeps headroom.
        block_q = min(block_q, 256)
        block_k = min(block_k, 256)
    # Final block selection: pad T to the 128-lane granule, then shrink
    # each block bound to the largest tile-aligned divisor of the padded
    # length (q blocks are a sublane dim → multiple of 8; k blocks a lane
    # dim → multiple of 128). Divisors of t_pad always exist at both
    # granules, so no extra padding beyond the 128 granule is ever added.
    t_pad = -(-t // 128) * 128
    block_q = divisor_block(block_q, 8, t_pad)
    block_k = divisor_block(block_k, 128, t_pad)
    if mesh is not None and mesh.size > 1:
        from jax.sharding import PartitionSpec as P
        hax = "model" if mesh.shape.get("model", 1) > 1 else None

        def core(q_, k_, v_, b_, g_, l_, s_):
            if dropout_rate > 0.0:
                # The kernels see shard-LOCAL b/h indices. The hash
                # pre-mix is linear in b and h (u = ... + b*_C_B + h*_C_H,
                # dropout_mask.uniform24), so offsetting the seed by the
                # shard's global index origin makes local indices hash
                # exactly like global ones — the mesh masks are BIT-
                # IDENTICAL to the unsharded call's (tested in
                # tests/test_flash_dropout.py).
                from .dropout_mask import _C_B, _C_H
                s_ = s_ + (jax.lax.axis_index("data").astype(jnp.int32)
                           * jnp.int32(q_.shape[0]) * jnp.int32(_C_B))
                if hax is not None:
                    s_ = s_ + (jax.lax.axis_index(hax).astype(jnp.int32)
                               * jnp.int32(q_.shape[1]) * jnp.int32(_C_H))
            return _flash_core(q_, k_, v_, b_, g_, l_, s_,
                               block_q, block_k, dropout_rate)

        fn = shard_wrap(
            core, mesh, per_arg_specs=(
                P("data", hax, None, None), P("data", hax, None, None),
                P("data", hax, None, None),
                P(hax, None, None) if bias is not None else None,
                P("data", hax, None) if gate is not None else None,
                P("data") if kv_len is not None else None,
                P()))
        return fn(q, k, v, bias, gate, kv_len, seed)
    return _flash_core(q, k, v, bias, gate, kv_len, seed,
                       block_q, block_k, dropout_rate)

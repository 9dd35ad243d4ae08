"""Fused flash attention (Pallas/TPU) with additive bias and per-query gate.

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

Forward-only: training uses the XLA path (flash backward is future work);
inference — where RTFx is measured — uses this kernel.
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

DEFAULT_BLOCK_Q = int(os.environ.get("WFL_FLASH_BQ", "256"))
DEFAULT_BLOCK_K = int(os.environ.get("WFL_FLASH_BK", "512"))
NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, bias_ref, gate_ref, kvlen_ref,
                  o_ref, *, block_k: int, sm_scale: float, t_pad: int,
                  has_bias: bool, has_gate: bool):
    # Blocks carry leading singleton (batch, head) dims:
    # q_ref: [1,1,BLOCK_Q,D]; k_ref/v_ref: [1,1,T_pad,D];
    # bias_ref: [1,BLOCK_Q,T_pad]; gate_ref: [1,1,BLOCK_Q,1];
    # kvlen_ref: [1,1,1] (SMEM); o_ref: [1,1,BLOCK_Q,D]
    block_q, d = q_ref.shape[2], q_ref.shape[3]
    kv_len = kvlen_ref[0, 0, 0]

    q = q_ref[0, 0].astype(jnp.float32) * sm_scale
    if has_gate:
        gate = gate_ref[0, 0].astype(jnp.float32)          # [BLOCK_Q, 1]

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

        m_cur = jnp.max(s, axis=1, keepdims=True)          # [BQ, 1]
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)                             # [BQ, BK]
        l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
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


@functools.partial(jax.jit, static_argnames=("block_q", "block_k"))
def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    bias: Optional[jnp.ndarray] = None,
                    gate: Optional[jnp.ndarray] = None,
                    kv_len: Optional[jnp.ndarray] = None,
                    block_q: int = DEFAULT_BLOCK_Q,
                    block_k: int = DEFAULT_BLOCK_K) -> jnp.ndarray:
    """q, k, v: [B, H, T, D] → [B, H, T, D].

    bias: [H, T, T] (shared over batch) or None; gate: [B, H, T] or None
    (requires bias); kv_len: [B] valid key count (None = T).
    """
    b, h, t, d = q.shape
    if gate is not None and bias is None:
        raise ValueError("gate requires bias")
    out_dtype = q.dtype

    block_q = min(block_q, max(t, 8))
    block_k = min(block_k, max(t, 128))
    t_pad_q = -(-t // block_q) * block_q
    t_pad_k = -(-t // block_k) * block_k
    t_pad = max(t_pad_q, t_pad_k)
    # one padded length for both q and k grids
    t_pad = -(-t_pad // block_q) * block_q
    t_pad = -(-t_pad // block_k) * block_k

    pad_t = [(0, 0), (0, 0), (0, t_pad - t), (0, 0)]
    qp = jnp.pad(q, pad_t)
    kp = jnp.pad(k, pad_t)
    vp = jnp.pad(v, pad_t)

    has_bias = bias is not None
    has_gate = gate is not None
    if has_bias:
        # Store the bias at the activation dtype (bf16 halves its HBM
        # traffic); the kernel accumulates scores in f32 regardless.
        bias_p = jnp.pad(bias.astype(out_dtype),
                         [(0, 0), (0, t_pad - t), (0, t_pad - t)])
    else:
        bias_p = jnp.zeros((1, 1, 1), q.dtype)
    if has_gate:
        gate_p = jnp.pad(gate, [(0, 0), (0, 0), (0, t_pad - t)])[..., None]
    else:
        gate_p = jnp.zeros((1, 1, 1, 1), q.dtype)

    if kv_len is None:
        kv_arr = jnp.full((b,), t, jnp.int32)
    else:
        kv_arr = jnp.broadcast_to(jnp.asarray(kv_len, jnp.int32), (b,))
    kv_arr = kv_arr.reshape(b, 1, 1)

    # Grid order (h, q, b): batch innermost so the (head, q-tile) bias block
    # stays VMEM-resident across batch iterations — bias HBM traffic is
    # [H,T,T] once per layer instead of once per (layer, batch element).
    grid = (h, t_pad // block_q, b)

    kernel = functools.partial(
        _flash_kernel, block_k=block_k, sm_scale=1.0 / np.sqrt(d),
        t_pad=t_pad, has_bias=has_bias, has_gate=has_gate)

    out = pl.pallas_call(
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
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d),
                               lambda hi, qi, bi: (bi, hi, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, t_pad, d), out_dtype),
        # interpret mode on non-TPU backends (tests on the CPU platform)
        interpret=jax.devices()[0].platform != "tpu",
    )(qp, kp, vp, bias_p, gate_p, kv_arr)
    return out[:, :, :t, :]

"""Model heads: BiLSTM, Conformer blocks, dilated conv stack, classifier,
boundary-offset head, language conditioning.

Each head replicates the observable numerics of the reference module it
corresponds to (reference model.py:6-52 and 96-142), including its quirks:
the Conformer conv module uses a **full** (not depthwise) k=31 convolution
with BatchNorm1d, post-LN attention, and **no final LayerNorm** (model.py:21-52);
the BiLSTM matches torch ``nn.LSTM`` gate order (i, f, g, o).

TPU design notes:
- The BiLSTM hoists the input projection out of the recurrence: one big
  [B·T, H]×[H, 4H] MXU matmul, then a ``lax.scan`` carrying only the [B, 4H]
  hidden-state GEMV chain. (A Pallas fused scan is the follow-up; the scan
  form is already XLA-pipelined.)
- BatchNorm keeps functional running statistics in a separate state pytree.
- All convs run in NCH layout; attention/softmax statistics in f32.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .layers import (attention_core, conv1d, dropout, embedding, gelu,
                     init_conv1d, init_embedding, init_layer_norm, init_linear,
                     layer_norm, linear)


# ---------------------------------------------------------------------------
# BiLSTM (torch nn.LSTM-compatible)
# ---------------------------------------------------------------------------

def init_lstm(rng, input_size: int, hidden_size: int, num_layers: int,
              bidirectional: bool = True) -> list:
    """Per (layer, direction) weight dict; torch init U(±1/√hidden)."""
    num_dirs = 2 if bidirectional else 1
    bound = 1.0 / math.sqrt(hidden_size)
    layers = []
    keys = iter(jax.random.split(rng, num_layers * num_dirs * 4))

    def u(k, shape):
        return jax.random.uniform(k, shape, jnp.float32, -bound, bound)

    for layer_i in range(num_layers):
        in_dim = input_size if layer_i == 0 else hidden_size * num_dirs
        dirs = []
        for _ in range(num_dirs):
            dirs.append({
                "w_ih": u(next(keys), (in_dim, 4 * hidden_size)),
                "w_hh": u(next(keys), (hidden_size, 4 * hidden_size)),
                "b_ih": u(next(keys), (4 * hidden_size,)),
                "b_hh": u(next(keys), (4 * hidden_size,)),
            })
        layers.append(dirs)
    return layers


def _lstm_direction(p, x: jnp.ndarray, reverse: bool,
                    mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """One LSTM direction over [B, T, in] → [B, T, hidden].

    The input projection is hoisted into a single time-parallel matmul; the
    scan carries only (h, c) and does the [B,H]×[H,4H] recurrent product.

    ``mask`` [B, T] (True = valid, right-padded): in the reverse direction the
    carry is reset to the initial state while scanning padded tail frames, so
    outputs on valid frames equal an exact-length run. The forward direction
    is causal and needs no masking.
    """
    b, t, _ = x.shape
    h_dim = p["w_hh"].shape[0]
    gates_x = x @ p["w_ih"].astype(x.dtype) + (p["b_ih"] + p["b_hh"]).astype(x.dtype)
    if reverse:
        gates_x = jnp.flip(gates_x, axis=1)

    w_hh = p["w_hh"].astype(x.dtype)
    use_mask = reverse and mask is not None
    if use_mask:
        mask_seq = jnp.swapaxes(jnp.flip(mask, axis=1), 0, 1)  # [T, B]

    def step(carry, inputs):
        h, c = carry
        if use_mask:
            gx, m = inputs
        else:
            gx = inputs
        gates = gx + h @ w_hh
        i, f, g, o = jnp.split(gates, 4, axis=-1)   # torch gate order
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        g = jnp.tanh(g)
        o = jax.nn.sigmoid(o)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        if use_mask:
            keep = m[:, None].astype(h.dtype)
            h = h * keep
            c = c * keep
        return (h, c), h

    init = (jnp.zeros((b, h_dim), x.dtype), jnp.zeros((b, h_dim), x.dtype))
    xs = (jnp.swapaxes(gates_x, 0, 1), mask_seq) if use_mask \
        else jnp.swapaxes(gates_x, 0, 1)
    _, hs = jax.lax.scan(step, init, xs)
    hs = jnp.swapaxes(hs, 0, 1)                       # [B, T, H]
    if reverse:
        hs = jnp.flip(hs, axis=1)
    return hs


def bilstm(params: list, x: jnp.ndarray,
           mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Stacked (bi)LSTM, torch ``nn.LSTM(batch_first=True)`` semantics."""
    for dirs in params:
        outs = [_lstm_direction(dirs[0], x, reverse=False)]
        if len(dirs) == 2:
            outs.append(_lstm_direction(dirs[1], x, reverse=True, mask=mask))
        x = jnp.concatenate(outs, axis=-1)
    return x


# ---------------------------------------------------------------------------
# BatchNorm1d (functional, running stats)
# ---------------------------------------------------------------------------

def init_batch_norm(c: int) -> Tuple[dict, dict]:
    params = {"scale": jnp.ones((c,), jnp.float32),
              "bias": jnp.zeros((c,), jnp.float32)}
    state = {"mean": jnp.zeros((c,), jnp.float32),
             "var": jnp.ones((c,), jnp.float32)}
    return params, state


def batch_norm(params, state, x: jnp.ndarray, train: bool,
               momentum: float = 0.1, eps: float = 1e-5):
    """x: [B, C, T]. Returns (y, new_state). Matches torch BatchNorm1d:
    batch stats (biased var) normalize in training; running var updated with
    the unbiased estimate; running stats used in eval."""
    if train:
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(0, 2))
        var = jnp.var(xf, axis=(0, 2))
        n = x.shape[0] * x.shape[2]
        unbiased = var * n / max(n - 1, 1)
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * unbiased,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    y = (x.astype(jnp.float32) - mean[None, :, None]) \
        * jax.lax.rsqrt(var[None, :, None] + eps)
    y = y * params["scale"][None, :, None] + params["bias"][None, :, None]
    return y.astype(x.dtype), new_state


# ---------------------------------------------------------------------------
# Conformer block (reference model.py:21-52 semantics)
# ---------------------------------------------------------------------------

def init_ff_module(rng, dim: int, expansion: int) -> dict:
    k1, k2 = jax.random.split(rng)
    return {"ln": init_layer_norm(dim),
            "in": init_linear(k1, dim, dim * expansion),
            "out": init_linear(k2, dim * expansion, dim)}


def ff_module(p, x: jnp.ndarray, drop_rate: float, rngs, deterministic: bool):
    """LN → Linear(×e) → GELU → Drop → Linear → Drop (model.py:6-19)."""
    h = layer_norm(p["ln"], x)
    h = gelu(linear(p["in"], h))
    if not deterministic:
        h = dropout(rngs.pop(), h, drop_rate, False)
    h = linear(p["out"], h)
    if not deterministic:
        h = dropout(rngs.pop(), h, drop_rate, False)
    return h


def init_conformer_block(rng, dim: int, heads: int, ff_expansion: int,
                         conv_kernel: int) -> Tuple[dict, dict]:
    keys = iter(jax.random.split(rng, 10))
    bn_params, bn_state = init_batch_norm(dim)
    params = {
        "ff1": init_ff_module(next(keys), dim, ff_expansion),
        "ff2": init_ff_module(next(keys), dim, ff_expansion),
        # torch nn.MultiheadAttention: packed qkv init is xavier_uniform on
        # the [3E, E] matrix; we keep split q/k/v with the same fan bounds.
        "q": init_linear(next(keys), dim, dim),
        "k": init_linear(next(keys), dim, dim),
        "v": init_linear(next(keys), dim, dim),
        "attn_out": init_linear(next(keys), dim, dim),
        "ln1": init_layer_norm(dim),
        "ln2": init_layer_norm(dim),
        "conv_pw1": init_conv1d(next(keys), dim, 2 * dim, 1),
        "conv_main": init_conv1d(next(keys), dim, dim, conv_kernel),
        "bn": bn_params,
        "conv_pw2": init_conv1d(next(keys), dim, dim, 1),
    }
    return params, {"bn": bn_state}


def conformer_block(params, state, x: jnp.ndarray, heads: int,
                    conv_kernel: int, drop_rate: float, rngs,
                    deterministic: bool, train: bool,
                    mask: Optional[jnp.ndarray] = None,
                    use_flash: bool = False, mesh=None,
                    strict_attn_dropout: bool = False):
    """Macaron FF halves, post-LN MHSA, conv module with **full** k-wide conv
    + BatchNorm, no final LayerNorm (reference model.py:40-52). Returns
    (y, new_state).

    ``mask`` [B, T] (inference-only, right-padded buckets): key-padding mask
    for attention, and the main conv's input is zeroed on padded frames so
    valid frames see exactly the zero padding an exact-length run would.
    """
    b, t, dim = x.shape
    d = dim // heads

    x = x + 0.5 * ff_module(params["ff1"], x, drop_rate, rngs, deterministic)

    def split(h):
        return h.reshape(b, t, heads, d).transpose(0, 2, 1, 3)

    q = split(linear(params["q"], x))
    k = split(linear(params["k"], x))
    v = split(linear(params["v"], x))
    # Same length/dtype policy as wavlm._attend: f32 only above ~1k frames
    # where the T² score traffic dominates; bf16 always — measured to hold
    # for bf16 *training* at short T too (flash 169.0 vs XLA 176.9 ms at
    # B=16×10 s, docs/PERFORMANCE.md). Static per trace.
    # First dropout key popped up front; the optional strict attention-prob
    # dropout key is DERIVED via fold_in so the pops-per-block count stays
    # unchanged (bit-identical key stream when the flag is off).
    k_hidden = rngs.pop() if not deterministic else None
    attn_rng = (jax.random.fold_in(k_hidden, 1)
                if (not deterministic and strict_attn_dropout
                    and drop_rate > 0.0) else None)
    from .wavlm import FLASH_MIN_T
    if use_flash and (x.dtype == jnp.bfloat16 or t >= FLASH_MIN_T):
        # differentiable Pallas kernel — used in training and inference;
        # strict attention dropout runs IN-KERNEL (dropout_mask.py).
        from ..ops.pallas.flash_attention_bwd import flash_attention_trainable
        kv_len = (jnp.sum(mask.astype(jnp.int32), axis=-1)
                  if mask is not None else None)
        drop = ({} if attn_rng is None else
                dict(dropout_rate=drop_rate,
                     dropout_seed=jax.random.randint(
                         attn_rng, (), -2**31, 2**31 - 1, jnp.int32)))
        attn = flash_attention_trainable(q, k, v, kv_len, mesh=mesh, **drop)
    else:
        attn = attention_core(q, k, v, mask=mask, dropout_rng=attn_rng,
                              dropout_rate=drop_rate)
    attn = linear(params["attn_out"],
                  attn.transpose(0, 2, 1, 3).reshape(b, t, dim))
    # torch MultiheadAttention applies dropout to attention *weights* and
    # the reference block adds NO dropout after it (model.py:29-31, 41-42);
    # by default we substitute an equivalent post-projection dropout
    # (measured equivalent, docs/PERFORMANCE.md A/B). Under
    # training.strict_attention_dropout the exact prob-level dropout ran
    # above INSTEAD (in-kernel on flash, on the probs on XLA) — the
    # substitute is skipped, matching the reference block exactly.
    if not deterministic and attn_rng is None:
        attn = dropout(k_hidden, attn, drop_rate, False)
    x = layer_norm(params["ln1"], x + attn)

    h = layer_norm(params["ln2"], x)
    h = jnp.swapaxes(h, 1, 2)                                # [B, C, T]
    h = conv1d(params["conv_pw1"], h)                        # [B, 2C, T]
    a, g = jnp.split(h, 2, axis=1)                           # GLU(dim=1)
    h = a * jax.nn.sigmoid(g)
    if mask is not None:
        h = h * mask[:, None, :].astype(h.dtype)
    h = conv1d(params["conv_main"], h, padding=conv_kernel // 2)
    h, new_bn = batch_norm(params["bn"], state["bn"], h, train)
    h = gelu(h)
    h = conv1d(params["conv_pw2"], h)
    h = jnp.swapaxes(h, 1, 2)
    if not deterministic:
        h = dropout(rngs.pop(), h, drop_rate, False)
    # Reference trims on length mismatch (model.py:46-49); with odd kernels
    # and same-padding lengths always agree, so no trim is needed here.
    x = x + h

    x = x + 0.5 * ff_module(params["ff2"], x, drop_rate, rngs, deterministic)
    return x, {"bn": new_bn}


# ---------------------------------------------------------------------------
# Dilated conv stack / offset head / language conditioning
# ---------------------------------------------------------------------------

def init_dilated_stack(rng, dim: int, depth: int, kernel: int) -> list:
    keys = jax.random.split(rng, max(depth, 1))
    return [init_conv1d(keys[i], dim, dim, kernel) for i in range(depth)]


def dilated_stack(params: list, x: jnp.ndarray, kernel: int,
                  mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """depth × (Conv1d(dilation=2^i, same-pad) + ReLU), reference
    model.py:126-133. x: [B, T, C]. With ``mask``, each conv's input is
    zeroed on padded frames (= exact-length zero padding)."""
    h = jnp.swapaxes(x, 1, 2)
    mask_c = mask[:, None, :].astype(h.dtype) if mask is not None else None
    for i, p in enumerate(params):
        dilation = 2 ** i
        padding = dilation * (kernel - 1) // 2
        if mask_c is not None:
            h = h * mask_c
        h = conv1d(p, h, padding=padding, dilation=dilation)
        h = jax.nn.relu(h)
    return jnp.swapaxes(h, 1, 2)


def init_offset_head(rng, dim: int) -> dict:
    k1, k2 = jax.random.split(rng)
    return {"conv1": init_conv1d(k1, dim, dim, 3),
            "conv2": init_conv1d(k2, dim, 2, 1)}


def offset_head(params, x: jnp.ndarray,
                mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Conv(k=3) → GELU → Conv(→2, k=1) → Sigmoid → [B, T, 2]
    (reference model.py:137-142)."""
    h = jnp.swapaxes(x, 1, 2)
    if mask is not None:
        h = h * mask[:, None, :].astype(h.dtype)
    h = gelu(conv1d(params["conv1"], h, padding=1))
    h = jax.nn.sigmoid(conv1d(params["conv2"], h))
    return jnp.swapaxes(h, 1, 2)


def init_lang_conditioning(rng, hidden: int, num_languages: int,
                           emb_dim: int) -> dict:
    k1, k2 = jax.random.split(rng)
    return {"emb": init_embedding(k1, max(num_languages, 1), emb_dim),
            "proj": init_linear(k2, hidden + emb_dim, hidden)}


def lang_conditioning(params, x: jnp.ndarray, lang_id: jnp.ndarray) -> jnp.ndarray:
    """Embed lang id, broadcast over T, concat, project back to hidden
    (reference model.py:176-180)."""
    emb = embedding(params["emb"], lang_id).astype(x.dtype)   # [B, E]
    emb = jnp.broadcast_to(emb[:, None, :],
                           (x.shape[0], x.shape[1], emb.shape[-1]))
    return linear(params["proj"], jnp.concatenate([x, emb], axis=-1))

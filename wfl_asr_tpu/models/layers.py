"""Functional NN primitives over plain parameter pytrees.

Design stance (SURVEY.md §7): a pure-functional model core — parameters are
nested dicts of ``jnp.ndarray``, modules are ``init_*``/apply function pairs.
This keeps weight conversion (HF torch → JAX), orbax checkpointing, and
NamedSharding annotation transparent, with no framework indirection between
the model and XLA.

Conventions:
- Linear weights are stored **[in, out]** (right-multiply form ``x @ W``),
  i.e. transposed from torch's ``nn.Linear.weight``.
- Conv1d weights are stored torch-style **[out, in/groups, k]** and applied
  with ``lax.conv_general_dilated`` in NCH layout.
- GELU is the exact erf form unless stated (torch ``nn.GELU()`` default);
  JAX's default is the tanh approximation, so this matters for parity.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    """Exact (erf) GELU — parity with torch ``nn.GELU()``/``F.gelu`` default."""
    return jax.nn.gelu(x, approximate=False)


# ---------------------------------------------------------------------------
# Initializers (match torch defaults so from-scratch training behaves alike)
# ---------------------------------------------------------------------------

def _uniform(rng, shape, bound):
    return jax.random.uniform(rng, shape, jnp.float32, -bound, bound)


def init_linear(rng, d_in: int, d_out: int, bias: bool = True):
    """torch ``nn.Linear`` default init: kaiming_uniform(a=√5) reduces to
    U(±1/√fan_in) for both weight and bias."""
    wk, bk = jax.random.split(rng)
    bound = 1.0 / math.sqrt(d_in)
    p = {"w": _uniform(wk, (d_in, d_out), bound)}
    if bias:
        p["b"] = _uniform(bk, (d_out,), bound)
    return p


def linear(p, x: jnp.ndarray) -> jnp.ndarray:
    if "w_q" in p:
        return _linear_int8(p, x)
    y = x @ p["w"].astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


# ---------------------------------------------------------------------------
# int8 serving quantization (W8A8-dynamic)
# ---------------------------------------------------------------------------
# The v5e MXU runs int8×int8→int32 at 2× its bf16 rate (394 vs 197 TOPS).
# Weights quantize per-output-channel offline; activations quantize
# per-token (per last-axis row) dynamically inside the layer, so the big
# projections run on the int8 MXU path while everything around them stays
# at the serving dtype. Pure serving-side transformation — checkpoints,
# training, and the conversion contract are untouched.

def _linear_int8(p, x: jnp.ndarray) -> jnp.ndarray:
    """x @ dequant(w_q) with dynamic per-row activation quantization.

    y = (round(x/s_x) int8 ·MXU· w_q int8).int32 → f32 · s_x · w_scale + b
    Rows that are exactly zero get a floor scale (quantizing 0/ε is 0).
    """
    s_x = jnp.max(jnp.abs(x), axis=-1, keepdims=True).astype(jnp.float32)
    s_x = jnp.maximum(s_x / 127.0, 1e-12)
    x_q = jnp.round(x.astype(jnp.float32) / s_x).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x_q, p["w_q"], (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * s_x * p["w_scale"]
    y = y.astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def quantize_linear_int8(p):
    """{"w": [in,out] float, "b"?} → {"w_q" int8, "w_scale" f32 [out], "b"?}
    (symmetric per-output-channel; round-half-even like torch quant)."""
    import numpy as np
    w = np.asarray(p["w"], np.float32)
    scale = np.maximum(np.max(np.abs(w), axis=0) / 127.0, 1e-12)
    w_q = np.clip(np.rint(w / scale), -127, 127).astype(np.int8)
    out = {"w_q": jnp.asarray(w_q),
           "w_scale": jnp.asarray(scale.astype(np.float32))}
    if "b" in p:
        out["b"] = p["b"]
    return out


def quantize_tree_int8(tree, min_dim: int = 256):
    """Recursively replace every plain linear param dict (2-D ``"w"`` with
    both dims ≥ ``min_dim``) with its int8 form. Small projections (gates,
    classifier heads, lang proj) stay exact — they are compute-noise and
    keeping them full-precision avoids any avoidable output drift."""
    if isinstance(tree, dict):
        if "w" in tree and getattr(tree["w"], "ndim", 0) == 2 \
                and min(tree["w"].shape) >= min_dim \
                and all(k in ("w", "b") for k in tree):
            return quantize_linear_int8(tree)
        return {k: quantize_tree_int8(v, min_dim) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return type(tree)(quantize_tree_int8(v, min_dim) for v in tree)
    return tree


def init_layer_norm(d: int):
    return {"scale": jnp.ones((d,), jnp.float32),
            "bias": jnp.zeros((d,), jnp.float32)}


def layer_norm(p, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """LayerNorm over the last axis, statistics in f32 regardless of input
    dtype (TPU-safe for bf16 activations)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"] + p["bias"]
    return y.astype(x.dtype)


def init_conv1d(rng, c_in: int, c_out: int, kernel: int, groups: int = 1,
                bias: bool = True):
    """torch ``nn.Conv1d`` default init (kaiming-uniform, fan-in bounds)."""
    wk, bk = jax.random.split(rng)
    fan_in = (c_in // groups) * kernel
    bound = 1.0 / math.sqrt(fan_in)
    p = {"w": _uniform(wk, (c_out, c_in // groups, kernel), bound)}
    if bias:
        p["b"] = _uniform(bk, (c_out,), bound)
    return p


def conv1d(p, x: jnp.ndarray, stride: int = 1, padding=0, groups: int = 1,
           dilation: int = 1) -> jnp.ndarray:
    """x: [B, C, T] (NCH). padding: int (symmetric) or "VALID"."""
    if isinstance(padding, int):
        pad: Sequence[Tuple[int, int]] = [(padding, padding)]
    elif padding == "VALID":
        pad = [(0, 0)]
    else:
        pad = padding
    # No preferred_element_type: TPU convs accumulate f32 internally for
    # bf16 operands anyway, and an f32-output override breaks the conv's
    # transpose rule under grad (cotangent f32 vs bf16 weights).
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype),
        window_strides=(stride,),
        padding=pad,
        rhs_dilation=(dilation,),
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=groups,
    )
    if "b" in p:
        y = y + p["b"].astype(x.dtype)[None, :, None]
    return y


def init_embedding(rng, n: int, d: int, std: float = 1.0):
    return {"w": jax.random.normal(rng, (n, d), jnp.float32) * std}


def embedding(p, ids: jnp.ndarray) -> jnp.ndarray:
    return jnp.take(p["w"], ids, axis=0)


def group_norm(scale, bias, x: jnp.ndarray, num_groups: int,
               eps: float = 1e-5,
               time_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """GroupNorm over [B, C, T]: per-group statistics over (C/G, T).

    ``time_mask`` [B, T] restricts statistics to valid timesteps (bucketed
    inference): valid positions then normalize exactly as in an exact-length
    run; padded positions are left as garbage for downstream masking.
    """
    b, c, t = x.shape
    xf = x.astype(jnp.float32).reshape(b, num_groups, c // num_groups, t)
    if time_mask is None:
        mean = jnp.mean(xf, axis=(2, 3), keepdims=True)
        var = jnp.var(xf, axis=(2, 3), keepdims=True)
    else:
        m = time_mask.astype(jnp.float32)[:, None, None, :]   # [B,1,1,T]
        count = jnp.maximum(jnp.sum(m, axis=(2, 3), keepdims=True), 1.0) \
            * (c // num_groups)
        mean = jnp.sum(xf * m, axis=(2, 3), keepdims=True) / count
        var = jnp.sum(jnp.square(xf - mean) * m, axis=(2, 3),
                      keepdims=True) / count
    y = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(b, c, t)
    return (y * scale[None, :, None] + bias[None, :, None]).astype(x.dtype)


def channel_stats(x: jnp.ndarray,
                  time_mask: Optional[jnp.ndarray] = None
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-(batch, channel) mean/variance over T of [B, T, C] in f32,
    optionally restricted to ``time_mask`` [B, T] (bucketed inference).
    Returns (mean [B, C], var [B, C]) — the statistics half of the WavLM
    layer-0 GroupNorm, shared by the channels-last norm below and the
    fused-conv fast path (which applies them inside its Pallas kernel)."""
    xf = x.astype(jnp.float32)
    if time_mask is None:
        return jnp.mean(xf, axis=1), jnp.var(xf, axis=1)
    m = time_mask.astype(jnp.float32)[:, :, None]             # [B, T, 1]
    count = jnp.maximum(jnp.sum(m, axis=1), 1.0)              # [B, 1]
    mean = jnp.sum(xf * m, axis=1) / count
    var = jnp.sum(jnp.square(xf - mean[:, None, :]) * m, axis=1) / count
    return mean, var


def group_norm_channels_last(scale, bias, x: jnp.ndarray, eps: float = 1e-5,
                             time_mask: Optional[jnp.ndarray] = None
                             ) -> jnp.ndarray:
    """Per-channel GroupNorm (num_groups == C) over [B, T, C]: statistics
    over T. Channels-last twin of ``group_norm`` for the WavLM layer-0 norm
    — same f32 math, no [B, C, T] layout round-trip."""
    mean, var = channel_stats(x, time_mask)
    y = (x.astype(jnp.float32) - mean[:, None, :]) \
        * jax.lax.rsqrt(var[:, None, :] + eps)
    return (y * scale[None, None, :] + bias[None, None, :]).astype(x.dtype)


def dropout(rng, x: jnp.ndarray, rate: float, deterministic: bool) -> jnp.ndarray:
    if deterministic or rate == 0.0:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0).astype(x.dtype)


class RngStream:
    """Splitting PRNG stream for dropout keys (shared by every model
    module — keep the None guard in one place)."""

    def __init__(self, rng):
        self._rng = rng

    def pop(self):
        if self._rng is None:
            raise ValueError("train mode requires an rng")
        self._rng, out = jax.random.split(self._rng)
        return out


class KeyListStream:
    """RngStream-compatible view over pre-split keys ``[K, 2]``.

    The remat'd per-layer functions (wavlm/whisper ``remat=True``) take
    their dropout keys as an explicit array argument — pre-popped from the
    main RngStream in the exact order the inline loop would pop them, so
    remat on/off is bit-identical — and pop rows by static index here.
    Over-popping raises (the pops-per-layer count is a hard contract)."""

    def __init__(self, keys):
        self._keys = keys
        self._i = 0

    def pop(self):
        if self._i >= self._keys.shape[0]:
            raise ValueError(
                f"KeyListStream exhausted after {self._keys.shape[0]} pops")
        out = self._keys[self._i]
        self._i += 1
        return out


def attention_core(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   bias: Optional[jnp.ndarray] = None,
                   mask: Optional[jnp.ndarray] = None,
                   dropout_rng=None,
                   dropout_rate: float = 0.0) -> jnp.ndarray:
    """Scaled dot-product attention.

    q,k,v: [B, H, T, D]; bias: broadcastable to [B, H, T, T]; mask: [B, T]
    (True = attend) applied as key-padding mask. Softmax in f32.
    Returns [B, H, T, D].

    dropout_rng/dropout_rate: attention-PROBABILITY dropout with torch
    semantics (inverted dropout on the softmax output, rows NOT
    renormalized) — what HF WavLM's ``attention_dropout`` and
    ``nn.MultiheadAttention(dropout=...)`` apply during training
    (reference model.py:29-31). Active only when a key is passed; the
    strict-parity training path (training.strict_attention_dropout) uses
    this when flash is off — the flash kernels implement the same
    semantics in-kernel via a position-stable hash mask
    (ops/pallas/dropout_mask.py).
    """
    d = q.shape[-1]
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    logits = logits * (1.0 / math.sqrt(d))
    if bias is not None:
        logits = logits + bias.astype(logits.dtype)
    if mask is not None:
        logits = jnp.where(mask[:, None, None, :], logits, jnp.float32(-1e30))
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    if dropout_rng is not None and dropout_rate > 0.0:
        probs = dropout(dropout_rng, probs, dropout_rate, False)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)

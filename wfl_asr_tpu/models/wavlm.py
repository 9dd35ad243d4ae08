"""WavLM encoder in JAX (hand-built — no upstream Flax WavLM exists).

Architecture per the public WavLM model (microsoft/wavlm-base-plus family),
matching HF ``WavLMModel`` numerics so converted checkpoints reproduce the
reference encoder path (reference model.py:72-81, 158-161):

- Conv feature encoder: 7 × Conv1d (512ch; kernels 10,3,3,3,3,2,2; strides
  5,2,2,2,2,2,2; VALID), "group" norm flavor = GroupNorm(512, 512) after
  layer 0 only, exact GELU. Total stride 320 → ~20 ms frames.
- Feature projection: LayerNorm → Linear(512→H) → dropout.
- Convolutional positional embedding: Conv1d(H,H,128,groups=16, pad 64),
  drop last timestep (even kernel), GELU. (Weight-norm is folded into a
  plain weight at conversion; mathematically identical at inference and an
  equivalent parameterization for training.)
- Transformer layers (post-LN flavor, ``do_stable_layer_norm=False``) with
  **gated relative position bias** attention: T5-style log buckets
  (num_buckets=320 → 160 signed, max_distance=800) embedded per head, and a
  per-query gate g = a·(b·c − 1) + 2 with (a,b) = σ(sum-pooled 8-dim
  projection of the query head vector), scaling the shared bias.

SpecAugment is structurally absent: the reference force-disables it
(model.py:76-79), so this implementation simply has no masking path.

TPU notes: all matmuls are einsum/dot on [B,T,H] blocks (MXU-shaped); the
position bias is computed once per sequence length and reused across layers;
softmax/LN statistics run in f32 with bf16-castable activations.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .layers import (KeyListStream, RngStream, attention_core, channel_stats, conv1d,
                     dropout, gelu, group_norm, init_conv1d, init_layer_norm,
                     init_linear, layer_norm, linear)

# Sequence length above which the Pallas flash kernel beats XLA attention
# (score-tensor traffic grows as T²; crossover measured on v5e between
# T=500 and T=1500 — see docs/PERFORMANCE.md). Static per trace.
FLASH_MIN_T = 1024


@dataclass(frozen=True)
class WavLMArch:
    """Architecture hyperparameters (defaults = wavlm-base/base-plus)."""
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    conv_dim: Tuple[int, ...] = (512,) * 7
    conv_kernel: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    conv_bias: bool = False
    feat_extract_norm: str = "group"          # "group" (base) | "layer" (large)
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    num_buckets: int = 320
    max_distance: int = 800
    do_stable_layer_norm: bool = False        # True for wavlm-large
    use_flash_attention: bool = False         # Pallas fused attention
    use_fused_conv: bool = False              # Pallas fused conv chain (infer)
    layer_norm_eps: float = 1e-5
    hidden_dropout: float = 0.1
    activation_dropout: float = 0.0
    # NOTE: by default attention-PROB dropout is not applied; the
    # post-projection hidden_dropout is the substituted regularizer —
    # measured equivalent (docs/PERFORMANCE.md A/B), the same policy the
    # conformer heads document (heads.py). Set strict_attention_dropout
    # for true probability dropout at this rate (exact HF WavLM
    # semantics, reference model.py:72-81): on the flash path it runs
    # IN-KERNEL via a position-stable hash mask
    # (ops/pallas/dropout_mask.py) — full memory efficiency — and on the
    # XLA path on the materialized probs. Inference is unaffected.
    attention_dropout: float = 0.0
    strict_attention_dropout: bool = False
    feat_proj_dropout: float = 0.0
    # LayerDrop (Fan et al. 2019): during training each transformer layer
    # is skipped with this probability (whole-batch decision, matching HF
    # WavLMEncoder). Static graphs compute the layer and where-select, so
    # it regularizes identically but does not save FLOPs.
    layerdrop: float = 0.0

    @classmethod
    def from_hf_config(cls, hf) -> "WavLMArch":
        return cls(
            hidden_size=hf.hidden_size, num_layers=hf.num_hidden_layers,
            num_heads=hf.num_attention_heads,
            intermediate_size=hf.intermediate_size,
            conv_dim=tuple(hf.conv_dim), conv_kernel=tuple(hf.conv_kernel),
            conv_stride=tuple(hf.conv_stride), conv_bias=hf.conv_bias,
            feat_extract_norm=hf.feat_extract_norm,
            num_conv_pos_embeddings=hf.num_conv_pos_embeddings,
            num_conv_pos_embedding_groups=hf.num_conv_pos_embedding_groups,
            num_buckets=hf.num_buckets, max_distance=hf.max_bucket_distance,
            do_stable_layer_norm=hf.do_stable_layer_norm,
            layer_norm_eps=hf.layer_norm_eps,
            hidden_dropout=hf.hidden_dropout,
            activation_dropout=hf.activation_dropout,
            attention_dropout=hf.attention_dropout,
            feat_proj_dropout=hf.feat_proj_dropout,
            layerdrop=hf.layerdrop,
        )

    def feature_lengths(self, num_samples: int) -> int:
        """Output frame count of the conv feature encoder for a sample count
        (floor((L - k)/s) + 1 per layer)."""
        length = num_samples
        for k, s in zip(self.conv_kernel, self.conv_stride):
            length = (length - k) // s + 1
        return length


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def init_wavlm(rng: jax.Array, arch: WavLMArch) -> dict:
    keys = iter(jax.random.split(rng, 64 + 8 * arch.num_layers))
    H, I = arch.hidden_size, arch.intermediate_size

    conv_layers = []
    c_in = 1
    for i, (c_out, k) in enumerate(zip(arch.conv_dim, arch.conv_kernel)):
        layer = {"conv": init_conv1d(next(keys), c_in, c_out, k,
                                     bias=arch.conv_bias)}
        if arch.feat_extract_norm == "layer" or (arch.feat_extract_norm == "group" and i == 0):
            layer["norm"] = init_layer_norm(c_out)  # scale/bias; group uses same params
        conv_layers.append(layer)
        c_in = c_out

    params = {
        "feature_encoder": conv_layers,
        "feature_projection": {
            "ln": init_layer_norm(arch.conv_dim[-1]),
            "proj": init_linear(next(keys), arch.conv_dim[-1], H),
        },
        "pos_conv": init_conv1d(next(keys), H, H, arch.num_conv_pos_embeddings,
                                groups=arch.num_conv_pos_embedding_groups),
        "encoder_ln": init_layer_norm(H),
        "rel_attn_embed": {"w": jax.random.normal(next(keys),
                                                  (arch.num_buckets, arch.num_heads),
                                                  jnp.float32) * 0.02},
        "layers": [],
    }

    for _ in range(arch.num_layers):
        params["layers"].append({
            "q": init_linear(next(keys), H, H),
            "k": init_linear(next(keys), H, H),
            "v": init_linear(next(keys), H, H),
            "out": init_linear(next(keys), H, H),
            "gru_gate_const": jnp.ones((arch.num_heads,), jnp.float32),
            "gru_gate": init_linear(next(keys), H // arch.num_heads, 8),
            "attn_ln": init_layer_norm(H),
            "ff_in": init_linear(next(keys), H, I),
            "ff_out": init_linear(next(keys), I, H),
            "final_ln": init_layer_norm(H),
        })
    return params


# ---------------------------------------------------------------------------
# Relative position buckets (T5-style, WavLM variant)
# ---------------------------------------------------------------------------

def relative_position_buckets(length: int, num_buckets: int,
                              max_distance: int) -> np.ndarray:
    """Bucket matrix [T, T] (host-side, static per length)."""
    half = num_buckets // 2
    context = np.arange(length)[:, None]
    memory = np.arange(length)[None, :]
    rel = memory - context
    buckets = (rel > 0).astype(np.int64) * half
    rel_abs = np.abs(rel)
    max_exact = half // 2
    is_small = rel_abs < max_exact
    large = max_exact + (
        np.log(np.maximum(rel_abs, 1).astype(np.float64) / max_exact)
        / math.log(max_distance / max_exact) * (half - max_exact)
    ).astype(np.int64)
    large = np.minimum(large, half - 1)
    buckets += np.where(is_small, rel_abs, large)
    return buckets


def position_bias(params, arch: WavLMArch, length: int) -> jnp.ndarray:
    """Shared (ungated) relative position bias, [H, T, T]."""
    buckets = jnp.asarray(relative_position_buckets(
        length, arch.num_buckets, arch.max_distance))
    values = jnp.take(params["rel_attn_embed"]["w"], buckets, axis=0)  # [T,T,H]
    return jnp.transpose(values, (2, 0, 1))


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def feature_encoder(params, arch: WavLMArch, audio: jnp.ndarray,
                    sample_mask: Optional[jnp.ndarray] = None,
                    mesh=None) -> jnp.ndarray:
    """Raw audio [B, S] → conv features [B, T, C].

    ``sample_mask`` [B, S] (bucketed inference): GroupNorm statistics are
    restricted to the valid conv frames, so valid outputs equal an
    exact-length run (the VALID convs themselves never mix padded samples
    into valid frames).
    """
    valid_len = (jnp.sum(sample_mask.astype(jnp.int32), axis=-1)
                 if sample_mask is not None else None)       # [B]
    layers = params["feature_encoder"]
    # Fused Pallas tail: the trailing run of C→C, k∈{2,3}, stride-2,
    # norm-free layers (layers 1-6 for base) runs as chained kernels,
    # keeping intermediate activations in VMEM instead of HBM round-trips.
    split = _fused_tail_start(arch) if arch.use_fused_conv else len(layers)
    if split == 1 and split < len(layers) \
            and _conv0_fast_ok(arch, audio.shape[-1]) \
            and arch.feat_extract_norm == "group":
        # Eligibility (_conv0_fast_ok) requires the row-group view to cover
        # every output frame: k0 == 2·s0 exactly, or k0 ≤ s0 with enough
        # rows at this static input length. Other configs (none of the
        # shipped presets) fall back to the XLA conv path instead of
        # silently truncating the last frame (r2/r3 advisor findings).
        # Channels-last fast path: layer 0 (C_in=1) as a windowed matmul
        # emitting [B, T, C] directly (no NCH conv lowering, no 3 GB
        # [B,C,T]→[B,T,C] relayout); GroupNorm *stats* as a fused XLA
        # reduction, with the normalization + GELU applied inside the
        # first Pallas chain's streaming pass.
        x = _conv0_windowed(layers[0], arch, audio)          # [B, T0, C]
        time_mask = None
        if valid_len is not None:
            valid_len = (valid_len - arch.conv_kernel[0]) \
                // arch.conv_stride[0] + 1
            time_mask = jnp.arange(x.shape[1])[None, :] < valid_len[:, None]
        mean, var = channel_stats(x, time_mask)              # [B, C] each
        inv = jax.lax.rsqrt(var + 1e-5)
        norm = (mean, inv, layers[0]["norm"]["scale"],
                layers[0]["norm"]["bias"])
        return _fused_tail(params, arch, x, split, input_norm=norm,
                           mesh=mesh)

    x = audio[:, None, :]                                    # [B, 1, S]
    for i, layer in enumerate(layers[:split]):
        # Measured on v5e: XLA's conv lowering beats per-tap strided matmuls
        # here (49 ms vs 97 ms for the stack at B=8) — strided slices cost
        # more than the conv's layout inefficiency.
        x = conv1d(layer["conv"], x, stride=arch.conv_stride[i],
                   padding="VALID")
        if valid_len is not None:
            valid_len = (valid_len - arch.conv_kernel[i]) \
                // arch.conv_stride[i] + 1
        if "norm" in layer:
            if arch.feat_extract_norm == "group" and i == 0:
                time_mask = None
                if valid_len is not None:
                    t_idx = jnp.arange(x.shape[-1])[None, :]
                    time_mask = t_idx < valid_len[:, None]
                x = group_norm(layer["norm"]["scale"], layer["norm"]["bias"],
                               x, num_groups=x.shape[1], time_mask=time_mask)
            else:  # "layer": LayerNorm over channels at each timestep
                x = jnp.swapaxes(
                    layer_norm(layer["norm"], jnp.swapaxes(x, 1, 2)), 1, 2)
        x = gelu(x)
    x = jnp.swapaxes(x, 1, 2)                                # [B, T, C]
    return _fused_tail(params, arch, x, split, mesh=mesh)


def _conv0_fast_ok(arch: WavLMArch, s: int) -> bool:
    """Can layer 0 run as the windowed matmul without dropping frames?

    The [S/s0, s0] row-group view has floor(S/s0) rows (pairs: one fewer).
    k0 == 2·s0 needs exactly rows−1 frames (always holds); k0 ≤ s0 needs
    t0 ≤ rows, which fails when S mod s0 ≥ k0 (an extra valid frame starts
    in the truncated remainder). S is static under jit, so this is a
    trace-time check; ineligible configs use the XLA conv path."""
    k0, s0 = arch.conv_kernel[0], arch.conv_stride[0]
    if k0 == 2 * s0:
        return True
    if k0 <= s0:
        return (s - k0) // s0 + 1 <= s // s0
    return False


def _conv0_windowed(layer, arch: WavLMArch, audio: jnp.ndarray) -> jnp.ndarray:
    """Layer-0 VALID conv (C_in=1, k ≤ 2·stride) as a windowed matmul:
    view the signal as [S/s, s] row-groups; each output frame is two
    consecutive groups flattened (first k taps) contracted with the kernel.
    Emits channels-last [B, T, C] with no im2col and no layout transpose."""
    k0, s0 = arch.conv_kernel[0], arch.conv_stride[0]
    b, s = audio.shape
    t0 = (s - k0) // s0 + 1
    v = audio[:, : (s // s0) * s0].reshape(b, s // s0, s0)
    if k0 > s0:
        win = jnp.concatenate([v[:, :-1], v[:, 1:]], axis=-1)[:, :t0, :k0]
    else:
        win = v[:, :t0, :k0]
    w = layer["conv"]["w"].astype(audio.dtype)               # [C, 1, k]
    y = jax.lax.dot_general(win, w[:, 0, :],
                            (((2,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32
                            ).astype(audio.dtype)            # [B, T0, C]
    if "b" in layer["conv"]:
        y = y + layer["conv"]["b"].astype(y.dtype)[None, None, :]
    return y


def _fused_tail(params, arch: WavLMArch, x: jnp.ndarray, split: int,
                input_norm=None, mesh=None) -> jnp.ndarray:
    """Run conv layers [split:] as fused Pallas chains on [B, T, C].
    ``input_norm`` (layer-0 GroupNorm stats) is applied inside the first
    chain's streaming pass."""
    layers = params["feature_encoder"]
    if split < len(layers):
        from ..ops.pallas.conv_fused import MAX_CHAIN, fused_conv_chain
        # Chains of ≤3 layers per kernel: all six at once needs either
        # 16k-row input blocks (tile·2⁶) or an 8 MB weight set resident
        # alongside them — both blow the ~16 MB VMEM. Two chains cost one
        # HBM round-trip of the mid-stack activation (~0.5 ms at B=16×30 s).
        for g in range(split, len(layers), MAX_CHAIN):
            ws = [layer["conv"]["w"]
                  for layer in layers[g: g + MAX_CHAIN]]
            x = fused_conv_chain(x, ws, input_norm=input_norm, mesh=mesh)
            input_norm = None
    return x


def _fused_tail_start(arch: WavLMArch) -> int:
    """Index of the first conv layer of the trailing fused-eligible run
    (C_in == C_out, k ∈ {2,3}, stride 2, no per-layer norm, no bias)."""
    if arch.conv_bias or arch.feat_extract_norm == "layer":
        return len(arch.conv_dim)
    j = len(arch.conv_dim)
    while j > 1:          # layer 0 always stays XLA (GroupNorm lives there)
        i = j - 1
        if (arch.conv_stride[i] == 2 and arch.conv_kernel[i] in (2, 3)
                and arch.conv_dim[i] == arch.conv_dim[i - 1]):
            j = i
        else:
            break
    return j


def _pos_conv_embed(params, arch: WavLMArch, x: jnp.ndarray) -> jnp.ndarray:
    y = conv1d(params["pos_conv"], jnp.swapaxes(x, 1, 2),
               padding=arch.num_conv_pos_embeddings // 2,
               groups=arch.num_conv_pos_embedding_groups)
    if arch.num_conv_pos_embeddings % 2 == 0:
        y = y[:, :, :-1]
    return jnp.swapaxes(gelu(y), 1, 2)


def _gate_values(layer, arch: WavLMArch, x: jnp.ndarray) -> jnp.ndarray:
    """WavLM's per-query position-bias gate → [B, H, T]."""
    b, t, _ = x.shape
    heads = arch.num_heads
    xh = x.reshape(b, t, heads, -1).transpose(0, 2, 1, 3)     # [B,H,T,D]
    proj = linear(layer["gru_gate"], xh)                      # [B,H,T,8]
    proj = proj.reshape(b, heads, t, 2, 4).sum(-1)            # [B,H,T,2]
    gates = jax.nn.sigmoid(proj.astype(jnp.float32))
    gate_a, gate_b = gates[..., 0], gates[..., 1]
    const = layer["gru_gate_const"].astype(jnp.float32)[None, :, None]
    return gate_a * (gate_b * const - 1.0) + 2.0              # [B,H,T]


def _gated_bias(layer, arch: WavLMArch, x: jnp.ndarray,
                pos_bias: jnp.ndarray) -> jnp.ndarray:
    """Per-query gate over the shared position bias → [B, H, T, T]."""
    gate = _gate_values(layer, arch, x)
    return gate[..., None] * pos_bias[None].astype(jnp.float32)


def _attend(layer, arch: WavLMArch, x: jnp.ndarray, pos_bias: jnp.ndarray,
            mask: Optional[jnp.ndarray], mesh=None,
            attn_rng=None) -> jnp.ndarray:
    """Gated-relative-bias attention: Pallas flash path (streams the shared
    [H,T,T] bias from HBM, no [B,H,T,T] materialization) or the XLA path.

    ``attn_rng``: non-None only under training.strict_attention_dropout —
    attention-probability dropout with exact reference semantics. On the
    flash path the dropout runs IN-KERNEL (position-stable hash mask,
    ops/pallas/dropout_mask.py) so strict training keeps the kernel's
    memory ceiling; the XLA path applies it on the materialized probs."""
    b, t, H = x.shape
    heads = arch.num_heads
    d = H // heads

    def split(h):
        return h.reshape(b, t, heads, d).transpose(0, 2, 1, 3)

    # Measured: a hand-fused [H, 3H] QKV matmul is ~1.6% SLOWER end to end
    # (3029 vs 3079 RTFx) — XLA already schedules the three dots well and
    # the weight concat adds traffic. Keep separate projections.
    q = split(linear(layer["q"], x))
    k = split(linear(layer["k"], x))
    v = split(linear(layer["v"], x))

    # In f32 (training) flash pays above ~1k frames, where XLA's [B,H,T,T]
    # materialization dominates — at 30 s/T=1500 XLA attention cannot even
    # fit the train step in HBM (OOM at B=4) — while below that XLA wins
    # (measured: B=16×10 s train step 284 ms XLA vs 313 ms flash). bf16
    # inference keeps flash at every length (1341→1959 RTFx at T=1499).
    # t and dtype are static per trace: a compile-time branch.
    if (arch.use_flash_attention
            and (x.dtype == jnp.bfloat16 or t >= FLASH_MIN_T)):
        from ..ops.pallas.flash_attention import flash_attention
        gate = _gate_values(layer, arch, x)
        kv_len = (jnp.sum(mask.astype(jnp.int32), axis=-1)
                  if mask is not None else None)
        drop = {}
        if attn_rng is not None:
            # strict attention dropout, in-kernel (torch semantics)
            drop = dict(dropout_rate=arch.attention_dropout,
                        dropout_seed=jax.random.randint(
                            attn_rng, (), -2**31, 2**31 - 1, jnp.int32))
        attn = flash_attention(q, k, v, bias=pos_bias, gate=gate,
                               kv_len=kv_len, mesh=mesh, **drop)
    else:
        gated = _gated_bias(layer, arch, x, pos_bias)
        attn = attention_core(q, k, v, bias=gated, mask=mask,
                              dropout_rng=attn_rng,
                              dropout_rate=arch.attention_dropout)
    return linear(layer["out"], attn.transpose(0, 2, 1, 3).reshape(b, t, H))


def encoder_layer(layer, arch: WavLMArch, x: jnp.ndarray,
                  pos_bias: jnp.ndarray,
                  mask: Optional[jnp.ndarray] = None,
                  rngs=None, deterministic: bool = True,
                  mesh=None) -> jnp.ndarray:
    # The first hidden-dropout key is popped up front (same key, same pop
    # order — bit-identical stream); the optional strict attention-dropout
    # key is DERIVED from it via fold_in so the pops-per-layer contract
    # (exactly 3, relied on by remat/PP key pre-popping) is unchanged.
    k_hidden = rngs.pop() if not deterministic else None
    attn_rng = (jax.random.fold_in(k_hidden, 1)
                if (not deterministic and arch.strict_attention_dropout
                    and arch.attention_dropout > 0.0) else None)
    attn = _attend(layer, arch, x, pos_bias, mask, mesh=mesh,
                   attn_rng=attn_rng)

    if not deterministic:
        attn = dropout(k_hidden, attn, arch.hidden_dropout, False)
    x = x + attn

    # post-LN flavor only (wavlm-base); pre-LN (wavlm-large) is dispatched
    # to encoder_layer_stable_ln before this is ever called.
    assert not arch.do_stable_layer_norm
    x = layer_norm(layer["attn_ln"], x, arch.layer_norm_eps)

    h = linear(layer["ff_in"], x)
    h = gelu(h)
    if not deterministic:
        h = dropout(rngs.pop(), h, arch.activation_dropout, False)
    h = linear(layer["ff_out"], h)
    if not deterministic:
        h = dropout(rngs.pop(), h, arch.hidden_dropout, False)
    x = x + h
    return layer_norm(layer["final_ln"], x, arch.layer_norm_eps)


def encoder_layer_stable_ln(layer, arch: WavLMArch, x: jnp.ndarray,
                            pos_bias: jnp.ndarray,
                            mask: Optional[jnp.ndarray] = None,
                            rngs=None, deterministic: bool = True,
                            mesh=None) -> jnp.ndarray:
    """Pre-LN layer flavor (``do_stable_layer_norm=True``, wavlm-large)."""
    residual = x
    xn = layer_norm(layer["attn_ln"], x, arch.layer_norm_eps)
    # pop-order / fold_in scheme: see encoder_layer
    k_hidden = rngs.pop() if not deterministic else None
    attn_rng = (jax.random.fold_in(k_hidden, 1)
                if (not deterministic and arch.strict_attention_dropout
                    and arch.attention_dropout > 0.0) else None)
    attn = _attend(layer, arch, xn, pos_bias, mask, mesh=mesh,
                   attn_rng=attn_rng)
    if not deterministic:
        attn = dropout(k_hidden, attn, arch.hidden_dropout, False)
    x = residual + attn

    h = layer_norm(layer["final_ln"], x, arch.layer_norm_eps)
    h = gelu(linear(layer["ff_in"], h))
    if not deterministic:
        h = dropout(rngs.pop(), h, arch.activation_dropout, False)
    h = linear(layer["ff_out"], h)
    if not deterministic:
        h = dropout(rngs.pop(), h, arch.hidden_dropout, False)
    return x + h


def wavlm_encode(params, arch: WavLMArch, audio: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None,
                 sample_mask: Optional[jnp.ndarray] = None,
                 rng: Optional[jax.Array] = None,
                 deterministic: bool = True,
                 compute_dtype=jnp.float32,
                 precomputed_pos_bias: Optional[jnp.ndarray] = None,
                 mesh=None, sequence_parallel: bool = False,
                 pp_microbatches: int = 0,
                 remat: bool = False) -> jnp.ndarray:
    """Full WavLM encoder: raw (normalized) audio [B, S] → [B, T, H].

    Equivalent to HF ``WavLMModel.forward(...).last_hidden_state`` with
    SpecAugment off (the reference's configuration, model.py:76-80).
    ``mask`` [B, T_frames] / ``sample_mask`` [B, S] enable exact-length
    numerics on bucketed inputs.

    ``sequence_parallel``: with a >1 ``model`` mesh axis, constrain the
    inter-layer activations to shard T over ``model`` (Megatron-SP;
    parallel/sp.py) — GSPMD inserts the attention all-gathers.

    Pipeline parallelism: when ``params["layers"]`` is a STACKED pytree
    (parallel/pp.py ``stack_layers`` + ``place_stacked``) the transformer
    stack runs the GPipe schedule over the mesh's ``stage`` axis instead
    of the Python layer loop; training works too (per-(layer, microbatch)
    dropout keys folded into the tick scan, schedule differentiable).
    ``pp_microbatches``: GPipe microbatch count (0 = one row-group per
    data shard, the minimum-bubble default).

    ``remat``: gradient checkpointing — wrap each encoder layer in
    ``jax.checkpoint`` so the backward pass rematerializes the layer's
    internals instead of keeping them resident (HBM ∝ layers → ∝ 1; the
    standard TPU memory/FLOPs trade for deep-encoder training). Dropout
    keys are pre-popped per layer in the inline loop's order, so remat
    on/off is bit-identical for the same seed. Forward-only callers gain
    nothing (XLA already frees forward activations).
    """
    rngs = RngStream(rng) if rng is not None else None
    audio = audio.astype(compute_dtype)

    feats = feature_encoder(params, arch, audio, sample_mask=sample_mask,
                            mesh=mesh)
    x = layer_norm(params["feature_projection"]["ln"], feats,
                   arch.layer_norm_eps)
    x = linear(params["feature_projection"]["proj"], x)
    if not deterministic:
        x = dropout(rngs.pop(), x, arch.feat_proj_dropout, False)

    if mask is not None:
        # Zero padded frames so they contribute nothing downstream (HF
        # zeroes hidden states under the attention mask the same way).
        x = x * mask[:, :, None].astype(x.dtype)

    x = x + _pos_conv_embed(params, arch, x)
    if not arch.do_stable_layer_norm:
        x = layer_norm(params["encoder_ln"], x, arch.layer_norm_eps)
    if not deterministic:
        x = dropout(rngs.pop(), x, arch.hidden_dropout, False)

    # The bias only depends on (params, T); at inference a session can
    # precompute it once per bucket length instead of re-gathering the
    # [T, T] bucket matrix every call (~8 ms at T=1499 on v5e).
    if precomputed_pos_bias is not None:
        pos_bias = precomputed_pos_bias
    else:
        pos_bias = position_bias(params, arch, x.shape[1])    # [H, T, T]
    layer_fn = (encoder_layer_stable_ln if arch.do_stable_layer_norm
                else encoder_layer)
    if isinstance(params["layers"], dict):
        # Stacked layers → GPipe pipeline over the mesh's 'stage' axis.
        from ..parallel import pp
        if mesh is None or "stage" not in mesh.shape:
            raise ValueError("stacked encoder layers require a "
                             "('data','stage') mesh (parallel/pp.py)")
        # Legal microbatch counts divide B/data (gpipe_apply needs M | B
        # and data | B/M). Clamp the requested count to the largest legal
        # divisor: the SAME knob must serve train (B=batch_size) and the
        # smaller validation batches without retuning.
        import math
        cap = x.shape[0] // dict(mesh.shape)["data"]
        m = int(pp_microbatches) or cap
        m = max(1, math.gcd(m, cap))

        def pp_layer(lp, h, rows, shr, key=None, layer_key=None):
            (pb,) = shr
            row_mask = rows[0] if rows else None
            # mesh=None: inside the PP shard_map the devices are already
            # manual, so kernel entry points run per-shard directly.
            skip = None
            if key is not None and arch.layerdrop > 0.0:
                # LayerDrop draws from the LAYER key (identical across
                # microbatches AND stages), so one step skips a layer for
                # the whole batch or not at all — the HF semantics the
                # sequential loop has. 0x4C44 ("LD") keeps the draw clear
                # of the fold_in(layer_key, mb_idx) dropout keys.
                k_ld = jax.random.fold_in(layer_key, 0x4C44)
                skip = jax.random.bernoulli(k_ld, arch.layerdrop)
            y = _pp_body(lp, h, pb, row_mask, key)
            return jnp.where(skip, h, y) if skip is not None else y

        def _pp_body(lp, h, pb, row_mask, key):
            return layer_fn(lp, arch, h, pb, mask=row_mask,
                            rngs=RngStream(key) if key is not None
                            else None,
                            deterministic=deterministic, mesh=None)

        if remat:
            # PP + remat: each stage rematerializes its local layers in
            # the backward scan — the per-stage analogue of the
            # sequential remat branch below (training.remat composes
            # with training.pipeline_parallel).
            _pp_body = jax.checkpoint(_pp_body)

        # Training: gpipe_apply folds a per-(layer, microbatch) key into
        # the tick scan — i.i.d. dropout masks, not the sequential pop
        # order (see gpipe_apply's docstring).
        x = pp.gpipe_apply(pp_layer, params["layers"], x, mesh,
                           microbatches=m,
                           per_row=(mask,) if mask is not None else (),
                           shared=(pos_bias,),
                           rng=None if deterministic else rngs.pop())
    else:
        from ..parallel.sp import shard_time, sp_active
        sp = sp_active(mesh, sequence_parallel)
        if sp:
            x = shard_time(x, mesh)
        # LayerDrop: whole-batch skip decision per layer (HF WavLMEncoder
        # semantics); the key pops BEFORE the layer's own dropout keys so
        # remat on/off stays bit-identical.
        ld = float(arch.layerdrop) if not deterministic else 0.0

        def _ld_skip():
            return (jax.random.bernoulli(rngs.pop(), ld)
                    if ld > 0.0 else None)

        if remat:
            # Each layer flavor pops exactly 3 dropout keys (hidden,
            # activation, hidden). Keys enter as an explicit argument so
            # they are NOT rematerialized state; popping them here keeps
            # the global split order identical to the inline loop.
            def _layer_remat(lp, h, lkeys):
                r = KeyListStream(lkeys) if lkeys is not None else None
                return layer_fn(lp, arch, h, pos_bias, mask=mask, rngs=r,
                                deterministic=deterministic, mesh=mesh)

            _layer_remat = jax.checkpoint(_layer_remat)
            for layer in params["layers"]:
                skip = _ld_skip()
                lkeys = (jnp.stack([rngs.pop() for _ in range(3)])
                         if not deterministic else None)
                y = _layer_remat(layer, x, lkeys)
                x = jnp.where(skip, x, y) if skip is not None else y
                if sp:
                    x = shard_time(x, mesh)
        else:
            for layer in params["layers"]:
                skip = _ld_skip()
                y = layer_fn(layer, arch, x, pos_bias, mask=mask,
                             rngs=rngs, deterministic=deterministic,
                             mesh=mesh)
                x = jnp.where(skip, x, y) if skip is not None else y
                if sp:
                    x = shard_time(x, mesh)

    if arch.do_stable_layer_norm:
        x = layer_norm(params["encoder_ln"], x, arch.layer_norm_eps)
    return x

"""Whisper encoder in JAX (hand-built, pre-LN transformer).

Matches HF ``WhisperModel.encoder`` numerics (the reference's whisper path,
model.py:68-71, 152-156): conv stem (k=3 pad 1; k=3 stride 2 pad 1) with exact
GELU, fixed sinusoidal position table added as a weight, pre-LN self-attention
layers (k_proj has no bias; q scaled by head_dim^-0.5), final LayerNorm.
Always consumes the fixed 30 s log-mel [B, n_mels, 3000] → [B, 1500, D].

TPU notes: the whole stack is static-shape [B, 1500, D] matmuls; activations
may be bf16 with f32 softmax/LN statistics.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .layers import (KeyListStream, RngStream, attention_core, conv1d, dropout, gelu,
                     init_conv1d, init_layer_norm, init_linear, layer_norm,
                     linear)


@dataclass(frozen=True)
class WhisperArch:
    """Encoder hyperparameters (defaults = whisper-base)."""
    d_model: int = 512
    num_layers: int = 6
    num_heads: int = 8
    ffn_dim: int = 2048
    num_mel_bins: int = 80
    max_source_positions: int = 1500
    use_flash_attention: bool = False   # Pallas fused attention (inference)
    dropout: float = 0.0
    activation_dropout: float = 0.0
    # LayerDrop on encoder layers (HF encoder_layerdrop); whole-batch
    # where-select, same semantics note as WavLMArch.layerdrop.
    layerdrop: float = 0.0

    @classmethod
    def from_hf_config(cls, hf) -> "WhisperArch":
        return cls(d_model=hf.d_model, num_layers=hf.encoder_layers,
                   num_heads=hf.encoder_attention_heads,
                   ffn_dim=hf.encoder_ffn_dim, num_mel_bins=hf.num_mel_bins,
                   max_source_positions=hf.max_source_positions,
                   dropout=hf.dropout, activation_dropout=hf.activation_dropout,
                   layerdrop=hf.encoder_layerdrop)


# Named presets for the public Whisper encoder family (d_model, layers, heads,
# ffn; num_mel_bins where it differs from 80). The reference accepts ANY HF
# checkpoint name (model.py:69-71); in this network-less environment the
# preset table must therefore cover every released encoder variant and
# *reject loudly* on anything else (unknown names previously fell through to
# the nearest size and died with a shape error deep in the forward — e.g.
# large-v3's 128-mel front-end vs the 80-mel "large" preset).
WHISPER_PRESETS = {
    "tiny": WhisperArch(384, 4, 6, 1536),
    "base": WhisperArch(512, 6, 8, 2048),
    "small": WhisperArch(768, 12, 12, 3072),
    "medium": WhisperArch(1024, 24, 16, 4096),
    "large": WhisperArch(1280, 32, 20, 5120),
    "large-v1": WhisperArch(1280, 32, 20, 5120),
    "large-v2": WhisperArch(1280, 32, 20, 5120),
    # v3 and v3-turbo share the 1280-dim 32-layer encoder with a 128-bin
    # log-mel front-end (turbo shrinks only the decoder, which this
    # framework never instantiates).
    "large-v3": WhisperArch(1280, 32, 20, 5120, num_mel_bins=128),
    "large-v3-turbo": WhisperArch(1280, 32, 20, 5120, num_mel_bins=128),
    "turbo": WhisperArch(1280, 32, 20, 5120, num_mel_bins=128),
}


def whisper_arch_from_name(model_name: str) -> WhisperArch:
    """Map names like "openai/whisper-base" / "whisper-small.en" /
    "whisper-large-v3-turbo" to presets, or read config.json from a local
    HF checkpoint directory (the layout from_pretrained consumes; reference
    model.py:69-71 accepts any name). Unknown names raise with the preset
    list — silently mapping (say) a 128-mel v3 onto the 80-mel "large"
    preset would fail with an opaque shape error mid-forward."""
    from .hf_local import local_hf_arch
    local = local_hf_arch(model_name, "whisper", "WhisperConfig",
                          WhisperArch, "model.whisper_model")
    if local is not None:
        return local
    tail = model_name.split("/")[-1].removeprefix("whisper-")
    size = tail.split(".")[0]            # drop ".en" language suffix
    if size not in WHISPER_PRESETS:
        raise ValueError(
            f"Unknown whisper variant {model_name!r}. Known presets: "
            f"{sorted(WHISPER_PRESETS)}. A local HF checkpoint DIRECTORY "
            f"(with config.json) is also accepted. For a custom "
            f"architecture set model.encoder_arch_overrides in the config "
            f"(fields of WhisperArch, e.g. d_model/num_layers/num_mel_bins).")
    return WHISPER_PRESETS[size]


def sinusoidal_positions(length: int, channels: int) -> np.ndarray:
    """Whisper's sinusoid table (log-spaced, [sin | cos] concatenated)."""
    log_timescale_increment = math.log(10000.0) / (channels // 2 - 1)
    inv_timescales = np.exp(-log_timescale_increment * np.arange(channels // 2))
    scaled_time = np.arange(length)[:, None] * inv_timescales[None, :]
    return np.concatenate([np.sin(scaled_time), np.cos(scaled_time)],
                          axis=1).astype(np.float32)


def init_whisper_encoder(rng: jax.Array, arch: WhisperArch) -> dict:
    keys = iter(jax.random.split(rng, 8 + 8 * arch.num_layers))
    D, F = arch.d_model, arch.ffn_dim
    params = {
        "conv1": init_conv1d(next(keys), arch.num_mel_bins, D, 3),
        "conv2": init_conv1d(next(keys), D, D, 3),
        "embed_positions": jnp.asarray(
            sinusoidal_positions(arch.max_source_positions, D)),
        "ln_post": init_layer_norm(D),
        "layers": [],
    }
    for _ in range(arch.num_layers):
        params["layers"].append({
            "attn_ln": init_layer_norm(D),
            "q": init_linear(next(keys), D, D),
            "k": init_linear(next(keys), D, D, bias=False),
            "v": init_linear(next(keys), D, D),
            "out": init_linear(next(keys), D, D),
            "final_ln": init_layer_norm(D),
            "ff_in": init_linear(next(keys), D, F),
            "ff_out": init_linear(next(keys), F, D),
        })
    return params


def whisper_encode(params, arch: WhisperArch, input_features: jnp.ndarray,
                   rng: Optional[jax.Array] = None,
                   deterministic: bool = True,
                   compute_dtype=jnp.float32, mesh=None,
                   sequence_parallel: bool = False,
                   pp_microbatches: int = 0,
                   remat: bool = False) -> jnp.ndarray:
    """Log-mel [B, n_mels, 3000] → hidden states [B, 1500, D].

    ``sequence_parallel``: shard T over the ``model`` mesh axis between
    layers (Megatron-SP, parallel/sp.py).

    ``remat``: gradient checkpointing — each layer under ``jax.checkpoint``
    (same contract as wavlm_encode: per-layer keys pre-popped in the
    inline loop's order, so remat on/off is bit-identical)."""
    rngs = RngStream(rng) if rng is not None else None
    x = input_features.astype(compute_dtype)

    x = gelu(conv1d(params["conv1"], x, padding=1))
    x = gelu(conv1d(params["conv2"], x, stride=2, padding=1))
    x = jnp.swapaxes(x, 1, 2)                                 # [B, T, D]
    x = x + params["embed_positions"].astype(compute_dtype)[None, : x.shape[1]]
    if not deterministic:
        x = dropout(rngs.pop(), x, arch.dropout, False)

    if isinstance(params["layers"], dict):
        # Stacked layers → GPipe pipeline over the mesh's 'stage' axis
        # (parallel/pp.py), same dispatch contract as wavlm_encode.
        from ..parallel import pp
        if mesh is None or "stage" not in mesh.shape:
            raise ValueError("stacked encoder layers require a "
                             "('data','stage') mesh (parallel/pp.py)")
        # clamp to the largest legal divisor of B/data — same rationale
        # as wavlm_encode's PP branch (validation batches are smaller)
        import math
        cap = x.shape[0] // dict(mesh.shape)["data"]
        m = int(pp_microbatches) or cap
        m = max(1, math.gcd(m, cap))

        def _pp_body(lp, h, key):
            r = RngStream(key) if key is not None else None
            return encoder_layer(lp, arch, h, rngs=r,
                                 deterministic=deterministic, mesh=None)

        if remat:
            # PP + remat: each stage rematerializes its local layers in
            # the backward scan (same contract as wavlm_encode's PP
            # branch; keys enter as explicit arguments).
            _pp_body = jax.checkpoint(_pp_body)

        def pp_layer(lp, h, rows, shr, key=None, layer_key=None):
            skip = None
            if key is not None and arch.layerdrop > 0.0:
                # whole-batch LayerDrop from the LAYER key (HF semantics;
                # see wavlm_encode's PP branch for the fold rationale).
                k_ld = jax.random.fold_in(layer_key, 0x4C44)
                skip = jax.random.bernoulli(k_ld, arch.layerdrop)
            y = _pp_body(lp, h, key)
            return jnp.where(skip, h, y) if skip is not None else y

        x = pp.gpipe_apply(pp_layer, params["layers"], x, mesh,
                           microbatches=m,
                           rng=None if deterministic else rngs.pop())
        return layer_norm(params["ln_post"], x)

    from ..parallel.sp import shard_time, sp_active
    sp = sp_active(mesh, sequence_parallel)
    if sp:
        x = shard_time(x, mesh)
    ld = float(arch.layerdrop) if not deterministic else 0.0

    def _ld_skip():
        return jax.random.bernoulli(rngs.pop(), ld) if ld > 0.0 else None

    if remat:
        # Each layer pops exactly 3 dropout keys (attn, activation, ffn).
        def _layer_remat(lp, h, lkeys):
            r = KeyListStream(lkeys) if lkeys is not None else None
            return encoder_layer(lp, arch, h, rngs=r,
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
            y = encoder_layer(layer, arch, x, rngs=rngs,
                              deterministic=deterministic, mesh=mesh)
            x = jnp.where(skip, x, y) if skip is not None else y
            if sp:
                x = shard_time(x, mesh)

    return layer_norm(params["ln_post"], x)


def encoder_layer(layer, arch: WhisperArch, x: jnp.ndarray,
                  rngs=None, deterministic: bool = True,
                  mesh=None) -> jnp.ndarray:
    """One pre-LN Whisper encoder layer (self-attention + FFN)."""
    b, t, D = x.shape
    heads = arch.num_heads
    d = D // heads

    def split(h):
        return h.reshape(b, t, heads, d).transpose(0, 2, 1, 3)

    residual = x
    h = layer_norm(layer["attn_ln"], x)
    q, k, v = (split(linear(layer[n], h)) for n in ("q", "k", "v"))
    if arch.use_flash_attention:
        # differentiable Pallas kernel — used in training and inference
        from ..ops.pallas.flash_attention_bwd import \
            flash_attention_trainable
        attn = flash_attention_trainable(q, k, v, mesh=mesh)
    else:
        attn = attention_core(q, k, v)
    attn = linear(layer["out"], attn.transpose(0, 2, 1, 3).reshape(b, t, D))
    if not deterministic:
        attn = dropout(rngs.pop(), attn, arch.dropout, False)
    x = residual + attn

    residual = x
    h = layer_norm(layer["final_ln"], x)
    h = gelu(linear(layer["ff_in"], h))
    if not deterministic:
        h = dropout(rngs.pop(), h, arch.activation_dropout, False)
    h = linear(layer["ff_out"], h)
    if not deterministic:
        h = dropout(rngs.pop(), h, arch.dropout, False)
    return residual + h

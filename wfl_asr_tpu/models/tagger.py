"""BIO phoneme tagger: encoder + language conditioning + heads + classifiers.

The JAX counterpart of the reference's ``BIOPhonemeTagger`` (model.py:54-194):

    audio [B, S], lang_id [B], max_label_len
        → encoder (whisper log-mel → transformer / wavlm / mel front-end)
        → trim-or-pad time axis to max_label_len (model.py:166-174)
        → lang embed concat + proj (model.py:176-180)
        → BiLSTM (optional) → Conformer × N → dilated conv (optional)
        → logits [B, T, n_tags], offsets [B, T, 2]

Differences from the reference are TPU-architectural, not observable:
feature extraction runs on device (no host round-trip, quirk Q5),
``max_label_len`` is a static Python int (padded-bucket batching), and
parameters/state are explicit pytrees. ``freeze_encoder`` is implemented
as stop_gradient on encoder output + an optax mask (instead of
requires_grad flags), and does not crash with ``encoder_type: none``
(reference quirk Q3).
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.frontend import (mel_spectrogram, wav2vec2_normalize,
                            wav2vec2_normalize_masked, whisper_log_mel)
from . import heads as H
from .layers import RngStream, init_linear, linear
from .wavlm import WavLMArch, init_wavlm, wavlm_encode
from .whisper import (WhisperArch, init_whisper_encoder, whisper_arch_from_name,
                      whisper_encode)

# Known WavLM checkpoint families → architecture presets (no network access).
WAVLM_PRESETS = {
    # Training-regularizer fields mirror the hub config.json values the
    # reference inherits via from_pretrained (model.py:76-81): the
    # microsoft/wavlm-* checkpoints ship feat_proj_dropout/attention_dropout
    # 0.1 and LayerDrop (base family 0.05, large 0.1). attention_dropout is
    # carried but prob-level dropout is not applied — see the WavLMArch
    # field note. All inactive at inference (deterministic).
    "base": WavLMArch(feat_proj_dropout=0.1, attention_dropout=0.1,
                      layerdrop=0.05),
    "base-plus": WavLMArch(feat_proj_dropout=0.1, attention_dropout=0.1,
                           layerdrop=0.05),
    # wavlm-large follows the wav2vec2-large conv recipe: per-layer
    # LayerNorm AND biased convs (microsoft/wavlm-large config.json sets
    # conv_bias: true, unlike the WavLMConfig default).
    "large": WavLMArch(hidden_size=1024, num_layers=24, num_heads=16,
                       intermediate_size=4096, feat_extract_norm="layer",
                       do_stable_layer_norm=True, conv_bias=True,
                       feat_proj_dropout=0.1, attention_dropout=0.1,
                       layerdrop=0.1),
}


def wavlm_arch_from_name(model_name: str) -> WavLMArch:
    # A local HF checkpoint directory (the layout from_pretrained consumes;
    # reference model.py:72-81 accepts any name): read its config.json —
    # custom-dimension fine-tuned encoders need no manual overrides.
    from .hf_local import local_hf_arch
    local = local_hf_arch(model_name, "wavlm", "WavLMConfig",
                          WavLMArch, "model.wavlm_model")
    if local is not None:
        return local
    tail = model_name.split("/")[-1].removeprefix("wavlm-")
    if tail in WAVLM_PRESETS:
        return WAVLM_PRESETS[tail]
    for key in ("large", "base-plus", "base"):
        # Substring match admits the task-suffixed family members that share
        # the encoder (wavlm-base-plus-sv, wavlm-base-sd, ...).
        if key in tail:
            return WAVLM_PRESETS[key]
    raise ValueError(
        f"Unknown wavlm model {model_name!r}. Known presets: "
        f"{sorted(WAVLM_PRESETS)} (plus task-suffixed variants of each). "
        f"A local HF checkpoint DIRECTORY (with config.json) is also "
        f"accepted. For a custom architecture set "
        f"model.encoder_arch_overrides in the config (fields of WavLMArch).")


@dataclass(frozen=True)
class TaggerArch:
    """All static hyperparameters of the tagger (hashable, jit-friendly)."""
    encoder_type: str                 # "whisper" | "wavlm" | "none"
    num_labels: int
    num_languages: int
    hidden_size: int
    lang_emb_dim: int = 64
    enable_bilstm: bool = True
    bilstm_num_layers: int = 1
    num_conformer_layers: int = 2
    conformer_heads: int = 4
    conformer_ff_expansion: int = 4
    conformer_kernel: int = 31
    conformer_dropout: float = 0.1
    enable_dilated_conv: bool = True
    dilated_depth: int = 2
    dilated_kernel: int = 3
    freeze_encoder: bool = False
    use_flash_attention: bool = False   # Pallas attention in Conformer blocks
    # training.strict_attention_dropout: apply true attention-probability
    # dropout (exact reference semantics — HF WavLM attention_dropout and
    # torch MultiheadAttention(dropout=...)) during training instead of
    # the default post-projection substitute: IN-KERNEL on the flash path
    # (ops/pallas/dropout_mask.py), on the materialized probs on the XLA
    # path. Inference is unaffected.
    strict_attention_dropout: bool = False
    sample_rate: int = 16000
    frame_duration: float = 0.02
    n_mels: int = 80
    wavlm: Optional[WavLMArch] = None
    whisper: Optional[WhisperArch] = None

    @classmethod
    def from_config(cls, cfg, num_labels: int) -> "TaggerArch":
        """Build from a ``wfl_asr_tpu.config.Config`` (defaults mirror
        reference model.py:57-142 ``.get`` sites)."""
        enc = cfg.encoder_type
        wavlm = whisper = None
        strict_attn = bool(cfg.raw.get("training", {})
                           .get("strict_attention_dropout", False))
        # Optional overrides of the named preset's architecture fields
        # (e.g. custom dims for experimentation or tiny test models).
        overrides = cfg.raw.get("model", {}).get("encoder_arch_overrides") or {}
        if enc == "whisper":
            # An unknown name WITH overrides builds on the family default —
            # otherwise the error's advertised escape hatch would be a dead
            # end (the preset lookup ran before overrides were applied).
            try:
                whisper = whisper_arch_from_name(cfg.encoder_name)
            except ValueError:
                if not overrides:
                    raise
                print(f"[WARN] Unknown whisper model "
                      f"{cfg.encoder_name!r}: building from the WhisperArch "
                      f"defaults + model.encoder_arch_overrides — overrides "
                      f"must name every field that differs from the "
                      f"defaults.")
                whisper = WhisperArch()
            if overrides:
                whisper = replace(whisper, **overrides)
            hidden = whisper.d_model
        elif enc == "wavlm":
            try:
                wavlm = wavlm_arch_from_name(cfg.encoder_name)
            except ValueError:
                if not overrides:
                    raise
                print(f"[WARN] Unknown wavlm model {cfg.encoder_name!r}: "
                      f"building from the WavLMArch defaults + "
                      f"model.encoder_arch_overrides — overrides must name "
                      f"every field that differs from the defaults.")
                wavlm = WavLMArch()
            if overrides:
                overrides = {k: tuple(v) if isinstance(v, list) else v
                             for k, v in overrides.items()}
                wavlm = replace(wavlm, **overrides)
            if strict_attn:
                wavlm = replace(wavlm, strict_attention_dropout=True)
            hidden = wavlm.hidden_size
        elif enc in ("none", "null"):
            enc = "none"
            hidden = cfg.n_mels
        else:
            raise ValueError(
                "Unsupported encoder type. Use 'whisper', 'wavlm', or 'none'.")
        return cls(
            encoder_type=enc, num_labels=num_labels,
            num_languages=cfg.num_languages, hidden_size=hidden,
            lang_emb_dim=cfg.lang_emb_dim,
            enable_bilstm=cfg.enable_bilstm,
            bilstm_num_layers=cfg.bilstm_num_layers,
            num_conformer_layers=cfg.num_conformer_layers,
            conformer_heads=cfg.conformer_heads,
            conformer_ff_expansion=cfg.conformer_ff_expansion,
            conformer_kernel=cfg.conformer_kernel_size,
            conformer_dropout=cfg.conformer_dropout,
            enable_dilated_conv=cfg.enable_dilated_conv,
            dilated_depth=cfg.dilated_conv_depth,
            dilated_kernel=cfg.dilated_conv_kernel,
            freeze_encoder=cfg.freeze_encoder,
            strict_attention_dropout=strict_attn,
            sample_rate=cfg.sample_rate, frame_duration=cfg.frame_duration,
            n_mels=cfg.n_mels, wavlm=wavlm, whisper=whisper,
        )


def init_tagger(rng: jax.Array, arch: TaggerArch) -> Tuple[dict, dict]:
    """Returns (params, state). state holds BatchNorm running stats."""
    keys = iter(jax.random.split(rng, 16 + arch.num_conformer_layers))
    Hd = arch.hidden_size

    params: dict = {}
    if arch.encoder_type == "whisper":
        params["encoder"] = init_whisper_encoder(next(keys), arch.whisper)
    elif arch.encoder_type == "wavlm":
        params["encoder"] = init_wavlm(next(keys), arch.wavlm)

    params["lang"] = H.init_lang_conditioning(next(keys), Hd,
                                              arch.num_languages,
                                              arch.lang_emb_dim)
    if arch.enable_bilstm:
        params["bilstm"] = H.init_lstm(next(keys), Hd, Hd // 2,
                                       arch.bilstm_num_layers)
    conformers, conformer_states = [], []
    for _ in range(arch.num_conformer_layers):
        p, s = H.init_conformer_block(next(keys), Hd, arch.conformer_heads,
                                      arch.conformer_ff_expansion,
                                      arch.conformer_kernel)
        conformers.append(p)
        conformer_states.append(s)
    params["conformer"] = conformers
    if arch.enable_dilated_conv:
        params["dilated"] = H.init_dilated_stack(next(keys), Hd,
                                                 arch.dilated_depth,
                                                 arch.dilated_kernel)
    params["classifier"] = init_linear(next(keys), Hd, arch.num_labels)
    params["offset_head"] = H.init_offset_head(next(keys), Hd)

    return params, {"conformer": conformer_states}


def encode(params, arch: TaggerArch, audio: jnp.ndarray,
           rng=None, deterministic: bool = True,
           compute_dtype=jnp.float32,
           sample_mask=None, frame_mask=None,
           precentered: bool = False,
           precomputed_pos_bias=None, mesh=None,
           sequence_parallel: bool = False,
           pp_microbatches: int = 0,
           remat: bool = False) -> jnp.ndarray:
    """Front-end + encoder → hidden states [B, T_enc, H], all on device.

    ``sample_mask``/``frame_mask``/``precentered`` support bucket-padded
    single-utterance inference: statistics and attention restricted to valid
    samples/frames so valid-frame outputs equal an exact-length run.
    """
    if arch.encoder_type == "whisper":
        feats = whisper_log_mel(audio, n_mels=arch.whisper.num_mel_bins)
        return whisper_encode(params["encoder"], arch.whisper, feats,
                              rng=rng, deterministic=deterministic,
                              compute_dtype=compute_dtype, mesh=mesh,
                              sequence_parallel=sequence_parallel,
                              pp_microbatches=pp_microbatches,
                              remat=remat)
    if arch.encoder_type == "wavlm":
        if sample_mask is not None:
            normed = wav2vec2_normalize_masked(audio, sample_mask)
        else:
            normed = wav2vec2_normalize(audio)
        return wavlm_encode(params["encoder"], arch.wavlm, normed,
                            mask=frame_mask, sample_mask=sample_mask,
                            rng=rng, deterministic=deterministic,
                            compute_dtype=compute_dtype,
                            precomputed_pos_bias=precomputed_pos_bias,
                            mesh=mesh,
                            sequence_parallel=sequence_parallel,
                            pp_microbatches=pp_microbatches,
                            remat=remat)
    # encoder_type "none": mel features are the hidden states (model.py:149-150)
    hop = int(arch.frame_duration * arch.sample_rate)
    return mel_spectrogram(audio, arch.sample_rate, 400, hop, arch.n_mels,
                           center=not precentered).astype(compute_dtype)


def _trim_or_pad(x: jnp.ndarray, length: int) -> jnp.ndarray:
    """Time-axis trim/zero-pad to ``length`` (reference model.py:166-174)."""
    t = x.shape[1]
    if t > length:
        return x[:, :length, :]
    if t < length:
        return jnp.pad(x, ((0, 0), (0, length - t), (0, 0)))
    return x


def apply_tagger(params, state, arch: TaggerArch, audio: jnp.ndarray,
                 lang_id: Optional[jnp.ndarray],
                 max_label_len: Optional[int] = None,
                 rng: Optional[jax.Array] = None,
                 train: bool = False,
                 compute_dtype=jnp.float32,
                 sample_mask=None, frame_mask=None,
                 precentered: bool = False,
                 precomputed_pos_bias=None, mesh=None,
                 sequence_parallel: bool = False,
                 pp_microbatches: int = 0,
                 remat: bool = False):
    """Forward pass. Returns (logits [B,T,n_tags], offsets [B,T,2], new_state).

    ``mesh``: a ('data','model') jax.sharding.Mesh — the Pallas kernels
    (flash attention, fused conv chains) run per-shard under shard_map
    instead of being disabled; the rest of the graph stays GSPMD-partitioned
    (global BatchNorm statistics, automatic gradient psums, Megatron TP).

    ``max_label_len`` must be a static int (padded-bucket batching);
    ``train`` toggles dropout + BatchNorm batch statistics.

    ``sample_mask`` [B, S] / ``frame_mask`` [B, T_enc] (inference-only):
    static-shape bucketed inference with exact-length numerics on valid
    frames. Training follows the reference's no-mask padded-batch semantics.
    """
    rngs = RngStream(rng)
    deterministic = not train

    enc_rng = rngs.pop() if train else None
    if arch.freeze_encoder and "encoder" in params:
        # Stop gradients at the encoder *parameters* (not just the output):
        # with zero-tangent inputs, linearization skips the encoder's JVP
        # entirely — which both saves work and allows forward-only Pallas
        # kernels (fused conv chains) inside a frozen encoder under grad.
        params = dict(params)
        params["encoder"] = jax.lax.stop_gradient(params["encoder"])
    hidden = encode(params, arch, audio, rng=enc_rng,
                    deterministic=deterministic, compute_dtype=compute_dtype,
                    sample_mask=sample_mask, frame_mask=frame_mask,
                    precentered=precentered,
                    precomputed_pos_bias=precomputed_pos_bias, mesh=mesh,
                    sequence_parallel=sequence_parallel,
                    pp_microbatches=pp_microbatches, remat=remat)
    if arch.freeze_encoder:
        hidden = jax.lax.stop_gradient(hidden)

    if max_label_len is not None:
        hidden = _trim_or_pad(hidden, int(max_label_len))
        if frame_mask is not None:
            frame_mask = _trim_or_pad(frame_mask[:, :, None],
                                      int(max_label_len))[:, :, 0]

    if lang_id is not None:
        hidden = H.lang_conditioning(params["lang"], hidden, lang_id)

    if arch.enable_bilstm:
        hidden = H.bilstm(params["bilstm"], hidden, mask=frame_mask)

    out = hidden
    new_conformer_states = []
    for p, s in zip(params["conformer"], state["conformer"]):
        out, ns = H.conformer_block(p, s, out, arch.conformer_heads,
                                    arch.conformer_kernel,
                                    arch.conformer_dropout, rngs,
                                    deterministic=deterministic, train=train,
                                    mask=frame_mask,
                                    use_flash=arch.use_flash_attention,
                                    mesh=mesh,
                                    strict_attn_dropout=
                                    arch.strict_attention_dropout)
        new_conformer_states.append(ns)

    if arch.enable_dilated_conv:
        out = H.dilated_stack(params["dilated"], out, arch.dilated_kernel,
                              mask=frame_mask)

    logits = linear(params["classifier"], out)
    offsets = H.offset_head(params["offset_head"], out, mask=frame_mask)
    return logits, offsets, {"conformer": new_conformer_states}

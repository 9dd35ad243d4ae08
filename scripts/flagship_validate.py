"""Flagship-scale validation (larger presets at real dimensions).

Modes:
  python scripts/flagship_validate.py parity   # CPU: numeric parity vs HF
  python scripts/flagship_validate.py rtfx     # TPU: inference RTFx rows

parity: builds HF models RANDOM-INIT at the true preset configs
(wavlm-large incl. conv_bias+stable-LN, whisper-small) — no network —
converts the state dicts and asserts output parity on short audio.

rtfx: batched inference throughput of each preset encoder + default head
stack at 30 s chunks, bf16, hard host-sync timing; rows land in
docs/PERFORMANCE.md.
"""

import sys
import time

import numpy as np

# repo root relative to this file (worktree-safe for A/B runs)
import os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

MODE = sys.argv[1] if len(sys.argv) > 1 else "rtfx"


def parity():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import torch

    with jax.default_matmul_precision("highest"):
        # --- wavlm-large at true dims ---
        from transformers.models.wavlm.configuration_wavlm import WavLMConfig
        from transformers import WavLMModel
        from wfl_asr_tpu.models.wavlm import WavLMArch, wavlm_encode
        from wfl_asr_tpu.models.convert import convert_wavlm
        from wfl_asr_tpu.models.tagger import WAVLM_PRESETS

        pre = WAVLM_PRESETS["large"]
        hf_cfg = WavLMConfig(
            hidden_size=pre.hidden_size, num_hidden_layers=pre.num_layers,
            num_attention_heads=pre.num_heads,
            intermediate_size=pre.intermediate_size,
            conv_bias=pre.conv_bias, feat_extract_norm=pre.feat_extract_norm,
            do_stable_layer_norm=pre.do_stable_layer_norm,
            num_buckets=pre.num_buckets,
            max_bucket_distance=pre.max_distance,
            apply_spec_augment=False, mask_time_prob=0.0, layerdrop=0.0,
            hidden_dropout=0.0, activation_dropout=0.0,
            attention_dropout=0.0, feat_proj_dropout=0.0)
        torch.manual_seed(0)
        model = WavLMModel(hf_cfg).eval()
        rng = np.random.RandomState(1)
        audio = rng.randn(1, 8000).astype(np.float32) * 0.5
        with torch.no_grad():
            ref = model(torch.tensor(audio)).last_hidden_state.numpy()
        arch = WavLMArch.from_hf_config(hf_cfg)
        params = convert_wavlm(model.state_dict(), arch)
        ours = np.asarray(wavlm_encode(params, arch, jnp.asarray(audio)))
        err = np.max(np.abs(ours - ref))
        print(f"wavlm-large parity: shape {ours.shape} vs {ref.shape}, "
              f"max|diff|={err:.3e}", flush=True)
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-3)
        del model, params

        # --- whisper-small encoder at true dims ---
        from transformers import WhisperConfig, WhisperModel
        from wfl_asr_tpu.models.whisper import (WhisperArch,
                                                whisper_arch_from_name,
                                                whisper_encode)
        from wfl_asr_tpu.models.convert import convert_whisper_encoder

        pre_small = whisper_arch_from_name("openai/whisper-small")
        hf_cfg = WhisperConfig(
            d_model=pre_small.d_model, encoder_layers=pre_small.num_layers,
            encoder_attention_heads=pre_small.num_heads,
            encoder_ffn_dim=pre_small.ffn_dim,
            num_mel_bins=pre_small.num_mel_bins, max_source_positions=1500,
            dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
            decoder_layers=1, decoder_attention_heads=2, decoder_ffn_dim=64)
        torch.manual_seed(0)
        model = WhisperModel(hf_cfg).eval()
        feats = np.random.RandomState(2).randn(1, 80, 3000) \
            .astype(np.float32)
        with torch.no_grad():
            ref = model.encoder(torch.tensor(feats)).last_hidden_state.numpy()
        arch = WhisperArch.from_hf_config(hf_cfg)
        params = convert_whisper_encoder(model.state_dict(), arch)
        ours = np.asarray(whisper_encode(params, arch, jnp.asarray(feats)))
        err = np.max(np.abs(ours - ref))
        print(f"whisper-small parity: shape {ours.shape} vs {ref.shape}, "
              f"max|diff|={err:.3e}", flush=True)
        np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-3)
        del model, params

        # --- whisper-large-v3 encoder at true dims (128 mel bins) ---
        pre = whisper_arch_from_name("openai/whisper-large-v3")
        hf_cfg = WhisperConfig(
            d_model=pre.d_model, encoder_layers=pre.num_layers,
            encoder_attention_heads=pre.num_heads,
            encoder_ffn_dim=pre.ffn_dim, num_mel_bins=pre.num_mel_bins,
            max_source_positions=1500, dropout=0.0, attention_dropout=0.0,
            activation_dropout=0.0, decoder_layers=1,
            decoder_attention_heads=2, decoder_ffn_dim=64)
        torch.manual_seed(0)
        model = WhisperModel(hf_cfg).eval()
        feats = np.random.RandomState(4).randn(1, 128, 3000) \
            .astype(np.float32)
        with torch.no_grad():
            ref = model.encoder(torch.tensor(feats)).last_hidden_state.numpy()
        arch = WhisperArch.from_hf_config(hf_cfg)
        params = convert_whisper_encoder(model.state_dict(), arch)
        ours = np.asarray(whisper_encode(params, arch, jnp.asarray(feats)))
        err = np.max(np.abs(ours - ref))
        print(f"whisper-large-v3 parity: shape {ours.shape} vs {ref.shape}, "
              f"max|diff|={err:.3e}", flush=True)
        np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-3)
    print("PARITY OK", flush=True)


def rtfx():
    import dataclasses
    import jax
    import jax.numpy as jnp
    from wfl_asr_tpu.models.tagger import (TaggerArch, apply_tagger,
                                           init_tagger)

    B = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    SECONDS = 30.0
    S = int(SECONDS * 16000)
    on_tpu = jax.devices()[0].platform == "tpu"

    presets = [
        ("wavlm-base", "wavlm", "microsoft/wavlm-base"),
        ("wavlm-large", "wavlm", "microsoft/wavlm-large"),
        ("whisper-small", "whisper", "openai/whisper-small"),
        ("whisper-medium", "whisper", "openai/whisper-medium"),
        ("whisper-large", "whisper", "openai/whisper-large"),
    ]
    rng = np.random.RandomState(0)
    audio = jnp.asarray((rng.randn(B, S) * 0.1).astype(np.float32))
    lang_ids = jnp.zeros((B,), jnp.int32)

    from wfl_asr_tpu.models.tagger import wavlm_arch_from_name
    from wfl_asr_tpu.models.whisper import whisper_arch_from_name
    for label, enc, name in presets:
        if enc == "wavlm":
            wa = wavlm_arch_from_name(name)
            if on_tpu:
                wa = dataclasses.replace(
                    wa, use_flash_attention=True,
                    use_fused_conv=(wa.feat_extract_norm == "group"))
            hidden, wavlm, whisper = wa.hidden_size, wa, None
        else:
            wh = whisper_arch_from_name(name)
            if on_tpu:
                wh = dataclasses.replace(wh, use_flash_attention=True)
            hidden, wavlm, whisper = wh.d_model, None, wh
        arch = TaggerArch(
            encoder_type=enc, num_labels=73, num_languages=2,
            hidden_size=hidden, lang_emb_dim=64, enable_bilstm=True,
            bilstm_num_layers=2, num_conformer_layers=2, conformer_heads=2,
            conformer_ff_expansion=2, conformer_kernel=31,
            enable_dilated_conv=True, dilated_depth=2, dilated_kernel=3,
            use_flash_attention=on_tpu, wavlm=wavlm, whisper=whisper)
        params, state = init_tagger(jax.random.PRNGKey(0), arch)
        params = jax.device_put(params)
        state = jax.device_put(state)

        @jax.jit
        def fwd(params, state, audio, lang_ids):
            logits, offsets, _ = apply_tagger(
                params, state, arch, audio, lang_ids,
                compute_dtype=jnp.bfloat16)
            return logits

        t0 = time.time()
        out = fwd(params, state, audio, lang_ids)
        np.asarray(out[0, :2, :2])
        print(f"{label}: compile+first {time.time()-t0:.1f}s", flush=True)
        ts = []
        for _ in range(6):
            t0 = time.perf_counter()
            out = fwd(params, state, audio, lang_ids)
            np.asarray(out[0, :2, :2])
            ts.append(time.perf_counter() - t0)
        ms = float(np.median(ts)) * 1e3
        rtfx = B * SECONDS / (ms * 1e-3)
        print(f"{label}: {ms:.1f} ms  (B={B} x 30 s → RTFx {rtfx:.0f})",
              flush=True)
        del params, state


if MODE == "parity":
    parity()
elif MODE == "rtfx":
    rtfx()
else:
    raise SystemExit(f"Unknown mode {MODE!r}: use 'parity' or 'rtfx'")

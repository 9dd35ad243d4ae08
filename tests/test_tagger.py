"""Full-model numeric parity: our JAX tagger vs the reference
``BIOPhonemeTagger`` (oracle), with ``from_pretrained`` patched to construct
small random-init HF models locally (no network)."""

import dataclasses

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests.test_encoders import small_wavlm_config, small_whisper_config


@pytest.fixture(scope="module", autouse=True)
def f32_matmuls():
    with jax.default_matmul_precision("highest"):
        yield


class _MelSpectrogramShim(torch.nn.Module):
    """torchaudio.transforms.MelSpectrogram stand-in (same math) for the
    reference's encoder_type="none" path."""

    def __init__(self, sample_rate, n_fft, hop_length, n_mels):
        super().__init__()
        from wfl_asr_tpu.ops import mel_filterbank
        self.n_mels = n_mels
        self.n_fft, self.hop = n_fft, hop_length
        fb = mel_filterbank(n_fft // 2 + 1, n_mels, sample_rate,
                            scale="htk", norm=None)
        self.register_buffer("fb", torch.tensor(fb))

    def forward(self, x):
        spec = torch.stft(x, self.n_fft, self.hop, win_length=self.n_fft,
                          window=torch.hann_window(self.n_fft),
                          center=True, pad_mode="reflect",
                          return_complex=True)
        power = spec.abs().pow(2.0)                          # [B, bins, T]
        return torch.einsum("bft,fm->bmt", power, self.fb)


def make_config(encoder_type, num_languages=3):
    return {
        "data": {"sample_rate": 16000, "frame_duration": 0.02, "n_mels": 80},
        "model": {
            "encoder_type": encoder_type,
            "whisper_model": "openai/whisper-base",
            "wavlm_model": "microsoft/wavlm-base-plus",
            "freeze_encoder": False,
            "enable_bilstm": True, "bilstm_num_layer": 2,
            "enable_dilated_conv": True, "dilated_conv_depth": 2,
            "dilated_conv_kernel": 3,
            "num_conformer_layers": 2, "conformer_heads": 2,
            "conformer_ff_expansion": 2, "conformer_kernel_size": 31,
            "conformer_dropout": 0.15,
            "lang_emb_dim": 16, "num_languages": num_languages,
        },
        "output": {"save_dir": "unused"},
        "postprocess": {"median_filter": 1, "merge_segments": "right"},
    }


@pytest.fixture()
def reference_tagger_module(reference_oracle):
    """The reference model module with HF factories patched to small local
    models."""
    import sys
    ref_model = sys.modules["model"]

    from transformers import (WhisperFeatureExtractor, WhisperModel,
                              Wav2Vec2FeatureExtractor, WavLMModel)

    whisper_cfg = small_whisper_config()
    wavlm_cfg = small_wavlm_config()

    class FakeWhisperModel:
        @staticmethod
        def from_pretrained(name):
            torch.manual_seed(42)
            return WhisperModel(whisper_cfg)

    class FakeWavLMModel:
        @staticmethod
        def from_pretrained(name, config=None):
            torch.manual_seed(43)
            return WavLMModel(config or wavlm_cfg)

    # Built with the real WavLMConfig class before it is patched below.
    wavlm_cfg_augmented = small_wavlm_config(apply_spec_augment=True,
                                             mask_time_prob=0.05)

    class FakeWavLMConfig:
        @staticmethod
        def from_pretrained(name):
            import copy
            return copy.deepcopy(wavlm_cfg_augmented)

    class FakeWhisperFE:
        @staticmethod
        def from_pretrained(name):
            return WhisperFeatureExtractor()

    class FakeW2V2FE:
        @staticmethod
        def from_pretrained(name):
            return Wav2Vec2FeatureExtractor(do_normalize=True)

    ref_model.WhisperModel = FakeWhisperModel
    ref_model.WhisperFeatureExtractor = FakeWhisperFE
    ref_model.WavLMModel = FakeWavLMModel
    ref_model.WavLMConfig = FakeWavLMConfig
    ref_model.Wav2Vec2FeatureExtractor = FakeW2V2FE
    ref_model.torchaudio.transforms.MelSpectrogram = _MelSpectrogramShim
    # model.py:73 re-imports WavLMConfig inside __init__ from transformers;
    # patch the transformers attribute too (restored after the test).
    import transformers
    orig = transformers.WavLMConfig
    transformers.WavLMConfig = FakeWavLMConfig
    yield ref_model, whisper_cfg, wavlm_cfg
    transformers.WavLMConfig = orig


def _our_arch(config, encoder_type, whisper_cfg, wavlm_cfg, num_labels):
    from wfl_asr_tpu.config import Config
    from wfl_asr_tpu.models.tagger import TaggerArch
    from wfl_asr_tpu.models.whisper import WhisperArch
    from wfl_asr_tpu.models.wavlm import WavLMArch

    cfg = Config(config)
    if encoder_type == "whisper":
        wa = WhisperArch.from_hf_config(whisper_cfg)
        hidden = wa.d_model
        return TaggerArch(
            encoder_type="whisper", num_labels=num_labels,
            num_languages=cfg.num_languages, hidden_size=hidden,
            lang_emb_dim=cfg.lang_emb_dim, enable_bilstm=True,
            bilstm_num_layers=2, num_conformer_layers=2, conformer_heads=2,
            conformer_ff_expansion=2, conformer_kernel=31,
            conformer_dropout=0.15, enable_dilated_conv=True,
            dilated_depth=2, dilated_kernel=3, whisper=wa)
    if encoder_type == "wavlm":
        wa = WavLMArch.from_hf_config(wavlm_cfg)
        return TaggerArch(
            encoder_type="wavlm", num_labels=num_labels,
            num_languages=cfg.num_languages, hidden_size=wa.hidden_size,
            lang_emb_dim=cfg.lang_emb_dim, enable_bilstm=True,
            bilstm_num_layers=2, num_conformer_layers=2, conformer_heads=2,
            conformer_ff_expansion=2, conformer_kernel=31,
            conformer_dropout=0.15, enable_dilated_conv=True,
            dilated_depth=2, dilated_kernel=3, wavlm=wa)
    return TaggerArch(
        encoder_type="none", num_labels=num_labels,
        num_languages=cfg.num_languages, hidden_size=80,
        lang_emb_dim=cfg.lang_emb_dim, enable_bilstm=True,
        bilstm_num_layers=2, num_conformer_layers=2, conformer_heads=2,
        conformer_ff_expansion=2, conformer_kernel=31,
        conformer_dropout=0.15, enable_dilated_conv=True,
        dilated_depth=2, dilated_kernel=3)


@pytest.mark.parametrize("encoder_type", ["none", "wavlm", "whisper"])
def test_tagger_full_parity(reference_tagger_module, encoder_type):
    ref_model, whisper_cfg, wavlm_cfg = reference_tagger_module
    from wfl_asr_tpu.models.convert import convert_tagger
    from wfl_asr_tpu.models.tagger import apply_tagger

    labels = [f"B-p{i}" for i in range(4)] + [f"I-p{i}" for i in range(4)] + ["O"]
    config = make_config(encoder_type)

    torch.manual_seed(7)
    ref = ref_model.BIOPhonemeTagger(config, labels).eval()

    rng = np.random.RandomState(3)
    # Two rows; second zero-padded — exercises padded-batch semantics.
    audio = np.zeros((2, 12800), dtype=np.float32)
    audio[0] = rng.randn(12800) * 0.4
    audio[1, :6400] = rng.randn(6400) * 0.4
    lang_ids = np.array([0, 2])
    max_label_len = 40

    with torch.no_grad():
        ref_logits, ref_offsets = ref(torch.tensor(audio),
                                      torch.tensor(lang_ids),
                                      max_label_len=max_label_len)

    arch = _our_arch(config, encoder_type, whisper_cfg, wavlm_cfg, len(labels))
    params, state = convert_tagger(ref.state_dict(), arch)
    logits, offsets, _ = apply_tagger(params, state, arch,
                                      jnp.asarray(audio),
                                      jnp.asarray(lang_ids),
                                      max_label_len=max_label_len)

    assert np.asarray(logits).shape == tuple(ref_logits.shape)
    np.testing.assert_allclose(np.asarray(logits), ref_logits.numpy(),
                               atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(offsets), ref_offsets.numpy(),
                               atol=5e-4, rtol=1e-3)


def test_tagger_export_roundtrip(reference_tagger_module):
    """export_tagger(convert_tagger(sd)) reproduces the torch state_dict."""
    ref_model, whisper_cfg, wavlm_cfg = reference_tagger_module
    from wfl_asr_tpu.models.convert import convert_tagger, export_tagger

    labels = ["B-a", "I-a", "O"]
    config = make_config("none")
    torch.manual_seed(9)
    ref = ref_model.BIOPhonemeTagger(config, labels).eval()
    sd = {k: v for k, v in ref.state_dict().items()
          if not k.startswith("mel_extractor.")}  # test shim's buffer

    arch = _our_arch(config, "none", whisper_cfg, wavlm_cfg, len(labels))
    params, state = convert_tagger(sd, arch)
    exported = export_tagger(params, state, arch)

    assert set(exported) == set(sd)
    for k in sd:
        np.testing.assert_allclose(exported[k], sd[k].numpy(), atol=1e-6,
                                   err_msg=k)

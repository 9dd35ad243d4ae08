"""Numeric parity of the JAX encoders vs random-init HF torch models (CPU,
eval mode). No network: HF models are constructed from local configs."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module", autouse=True)
def f32_matmuls():
    with jax.default_matmul_precision("highest"):
        yield


def small_wavlm_config(**over):
    # Deep import: immune to tests that patch transformers.WavLMConfig.
    from transformers.models.wavlm.configuration_wavlm import WavLMConfig
    kw = dict(
        hidden_size=96, num_hidden_layers=3, num_attention_heads=4,
        intermediate_size=192, conv_dim=[32, 32, 32],
        conv_kernel=[10, 3, 3], conv_stride=[5, 2, 2], conv_bias=False,
        feat_extract_norm="group", num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4, num_buckets=40,
        max_bucket_distance=100, do_stable_layer_norm=False,
        apply_spec_augment=False, mask_time_prob=0.0, mask_time_length=1,
        layerdrop=0.0, hidden_dropout=0.0, activation_dropout=0.0,
        attention_dropout=0.0, feat_proj_dropout=0.0,
    )
    kw.update(over)
    return WavLMConfig(**kw)


@pytest.mark.parametrize("flavor", ["base", "stable_ln"])
def test_wavlm_parity(flavor):
    from transformers import WavLMModel
    from wfl_asr_tpu.models.wavlm import WavLMArch, wavlm_encode
    from wfl_asr_tpu.models.convert import convert_wavlm

    torch.manual_seed(0)
    if flavor == "base":
        hf_cfg = small_wavlm_config()
    else:
        hf_cfg = small_wavlm_config(do_stable_layer_norm=True,
                                    feat_extract_norm="layer")
    model = WavLMModel(hf_cfg).eval()

    rng = np.random.RandomState(1)
    audio = rng.randn(2, 3200).astype(np.float32) * 0.5

    with torch.no_grad():
        ref = model(torch.tensor(audio)).last_hidden_state.numpy()

    arch = WavLMArch.from_hf_config(hf_cfg)
    params = convert_wavlm(model.state_dict(), arch)
    ours = np.asarray(wavlm_encode(params, arch, jnp.asarray(audio)))

    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


def test_wavlm_feature_lengths():
    from wfl_asr_tpu.models.wavlm import WavLMArch
    arch = WavLMArch()
    # ~20 ms stride-320 framing with a 400-sample receptive field
    for s in [400, 16000, 48000, 480000]:
        expected = s
        for k, st in zip(arch.conv_kernel, arch.conv_stride):
            expected = (expected - k) // st + 1
        assert arch.feature_lengths(s) == expected
    assert arch.feature_lengths(16000) == 49


def small_whisper_config():
    from transformers import WhisperConfig
    return WhisperConfig(
        d_model=64, encoder_layers=2, encoder_attention_heads=4,
        encoder_ffn_dim=128, num_mel_bins=80, max_source_positions=1500,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        decoder_layers=1, decoder_attention_heads=2, decoder_ffn_dim=64,
    )


def test_whisper_encoder_parity():
    from transformers import WhisperModel
    from wfl_asr_tpu.models.whisper import WhisperArch, whisper_encode
    from wfl_asr_tpu.models.convert import convert_whisper_encoder

    torch.manual_seed(0)
    hf_cfg = small_whisper_config()
    model = WhisperModel(hf_cfg).eval()

    rng = np.random.RandomState(2)
    feats = rng.randn(2, 80, 3000).astype(np.float32)

    with torch.no_grad():
        ref = model.encoder(torch.tensor(feats)).last_hidden_state.numpy()

    arch = WhisperArch.from_hf_config(hf_cfg)
    params = convert_whisper_encoder(model.state_dict(), arch)
    ours = np.asarray(whisper_encode(params, arch, jnp.asarray(feats)))

    assert ours.shape == ref.shape == (2, 1500, 64)
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


def test_whisper_sinusoids_match_hf():
    from transformers import WhisperModel
    from wfl_asr_tpu.models.whisper import sinusoidal_positions
    model = WhisperModel(small_whisper_config()).eval()
    ref = model.encoder.embed_positions.weight.detach().numpy()
    ours = sinusoidal_positions(1500, 64)
    np.testing.assert_allclose(ours, ref, atol=2e-4)  # f32 trig eval order


def test_whisper_arch_from_name():
    from wfl_asr_tpu.models.whisper import whisper_arch_from_name
    assert whisper_arch_from_name("openai/whisper-base").d_model == 512
    assert whisper_arch_from_name("openai/whisper-small").d_model == 768
    assert whisper_arch_from_name("whisper-large-v3").d_model == 1280
    assert whisper_arch_from_name("openai/whisper-tiny.en").num_layers == 4


def test_wavlm_large_preset_matches_upstream_config():
    """wavlm-large follows the wav2vec2-large conv recipe: per-layer
    LayerNorm, stable LN, and *biased* convs (microsoft/wavlm-large
    config.json: conv_bias true — unlike the WavLMConfig default)."""
    from wfl_asr_tpu.models.tagger import WAVLM_PRESETS, wavlm_arch_from_name
    large = WAVLM_PRESETS["large"]
    assert large.conv_bias is True
    assert large.feat_extract_norm == "layer"
    assert large.do_stable_layer_norm is True
    assert wavlm_arch_from_name("microsoft/wavlm-large") is large
    base = WAVLM_PRESETS["base"]
    assert base.conv_bias is False and base.feat_extract_norm == "group"


def test_whisper_v3_presets():
    """large-v3 / turbo are distinct presets with the 128-bin mel front-end
    (the reference loads any HF name, model.py:69-71; silently mapping v3
    onto the 80-mel 'large' preset would shape-error mid-forward)."""
    from wfl_asr_tpu.models.whisper import (WHISPER_PRESETS,
                                            whisper_arch_from_name)
    v3 = whisper_arch_from_name("openai/whisper-large-v3")
    assert v3.num_mel_bins == 128 and v3.d_model == 1280
    assert v3.num_layers == 32 and v3.num_heads == 20
    turbo = whisper_arch_from_name("openai/whisper-large-v3-turbo")
    assert turbo == v3  # turbo shrinks only the (never-built) decoder
    assert whisper_arch_from_name("whisper-turbo").num_mel_bins == 128
    assert whisper_arch_from_name("whisper-large-v2").num_mel_bins == 80
    assert whisper_arch_from_name("whisper-large-v1") == \
        WHISPER_PRESETS["large"]


def test_unknown_encoder_names_fail_loudly():
    from wfl_asr_tpu.models.whisper import whisper_arch_from_name
    from wfl_asr_tpu.models.tagger import wavlm_arch_from_name
    with pytest.raises(ValueError) as e:
        whisper_arch_from_name("openai/whisper-large-v4")
    assert "large-v3" in str(e.value)               # names the presets
    assert "encoder_arch_overrides" in str(e.value)  # names the escape hatch
    with pytest.raises(ValueError) as e:
        wavlm_arch_from_name("microsoft/wavlm-colossal")
    assert "large" in str(e.value)
    assert "encoder_arch_overrides" in str(e.value)


def test_conv0_fast_path_eligibility():
    """The windowed-matmul layer-0 fast path must refuse configs where the
    row-group view drops the last output frame (k0 ≤ s0 with
    S mod s0 ≥ k0 — r3 review) and all s0 < k0 < 2·s0 shapes; k0 == 2·s0
    (every shipped preset) is always eligible."""
    import dataclasses
    from wfl_asr_tpu.models.wavlm import WavLMArch, _conv0_fast_ok

    base = WavLMArch()
    assert _conv0_fast_ok(base, 16000)          # k0=10 = 2*s0=5
    k3 = dataclasses.replace(base, conv_kernel=(3,) + base.conv_kernel[1:])
    assert not _conv0_fast_ok(k3, 14)           # t0=3 > rows=2 → truncates
    assert _conv0_fast_ok(k3, 15)               # t0=3 == rows=3 → exact
    k7 = dataclasses.replace(base, conv_kernel=(7,) + base.conv_kernel[1:])
    assert not _conv0_fast_ok(k7, 16000)        # s0 < k0 < 2*s0 window case


def test_unknown_encoder_name_with_overrides_builds_arch():
    """The error's advertised escape hatch must actually work: an unknown
    encoder name + model.encoder_arch_overrides builds from the family
    defaults + overrides instead of raising (r3 review: the preset lookup
    used to run before overrides were applied, making the hatch a dead
    end)."""
    from wfl_asr_tpu.config import Config
    from wfl_asr_tpu.models.tagger import TaggerArch

    def cfg_for(enc, name, overrides):
        raw = {"model": {"encoder_type": enc, "whisper_model": name,
                         "wavlm_model": name, "num_languages": 0,
                         "encoder_arch_overrides": overrides},
               "data": {}, "training": {}, "output": {}}
        return Config(raw)

    arch = TaggerArch.from_config(
        cfg_for("whisper", "my-whisper-distil",
                {"d_model": 128, "num_layers": 2, "num_heads": 4,
                 "ffn_dim": 256}), num_labels=5)
    assert arch.whisper.d_model == 128 and arch.whisper.num_layers == 2
    assert arch.hidden_size == 128

    arch = TaggerArch.from_config(
        cfg_for("wavlm", "my-wavlm-fork",
                {"hidden_size": 96, "num_layers": 2, "num_heads": 4,
                 "intermediate_size": 192}), num_labels=5)
    assert arch.wavlm.hidden_size == 96 and arch.hidden_size == 96

    # without overrides the unknown name still fails loudly
    with pytest.raises(ValueError):
        TaggerArch.from_config(cfg_for("wavlm", "my-wavlm-fork", {}),
                               num_labels=5)


def test_whisper_128mel_encoder_parity():
    """Front-end + encoder parity at v3's 128 mel bins (small dims): our
    whisper_log_mel(n_mels=128) + encoder vs HF WhisperFeatureExtractor
    (feature_size=128) + WhisperModel.encoder."""
    from transformers import WhisperFeatureExtractor, WhisperModel, WhisperConfig
    from wfl_asr_tpu.models.whisper import WhisperArch, whisper_encode
    from wfl_asr_tpu.models.convert import convert_whisper_encoder
    from wfl_asr_tpu.ops import whisper_log_mel

    torch.manual_seed(0)
    hf_cfg = WhisperConfig(
        d_model=64, encoder_layers=2, encoder_attention_heads=4,
        encoder_ffn_dim=128, num_mel_bins=128, max_source_positions=1500,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        decoder_layers=1, decoder_attention_heads=2, decoder_ffn_dim=64)
    model = WhisperModel(hf_cfg).eval()
    fe = WhisperFeatureExtractor(feature_size=128)

    rng = np.random.RandomState(3)
    audio = (rng.randn(16000 * 2) * 0.3).astype(np.float32)

    feats_ref = fe(audio, sampling_rate=16000,
                   return_tensors="np")["input_features"]    # [1, 128, 3000]
    with torch.no_grad():
        ref = model.encoder(torch.tensor(feats_ref)).last_hidden_state.numpy()

    arch = WhisperArch.from_hf_config(hf_cfg)
    assert arch.num_mel_bins == 128
    params = convert_whisper_encoder(model.state_dict(), arch)
    feats = whisper_log_mel(jnp.asarray(audio[None]), n_mels=128)
    np.testing.assert_allclose(np.asarray(feats), feats_ref,
                               atol=2e-4, rtol=1e-4)
    ours = np.asarray(whisper_encode(params, arch, feats))
    assert ours.shape == ref.shape == (1, 1500, 64)
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


def test_arch_from_local_hf_checkpoint_dir(tmp_path):
    """A local HF checkpoint directory (the from_pretrained layout) is a
    valid model name: config.json supplies the architecture, so a
    custom-dimension fine-tuned encoder needs no manual overrides
    (reference model.py:69-81 accepts any name)."""
    from transformers import WavLMConfig, WhisperConfig
    from wfl_asr_tpu.models.tagger import wavlm_arch_from_name
    from wfl_asr_tpu.models.whisper import whisper_arch_from_name

    wdir = tmp_path / "my-finetuned-wavlm"
    wdir.mkdir()
    WavLMConfig(hidden_size=96, num_hidden_layers=3, num_attention_heads=4,
                intermediate_size=192, conv_dim=[32] * 7,
                do_stable_layer_norm=True, conv_bias=True,
                feat_extract_norm="layer").save_pretrained(str(wdir))
    arch = wavlm_arch_from_name(str(wdir))
    assert (arch.hidden_size, arch.num_layers, arch.num_heads) == (96, 3, 4)
    assert arch.conv_dim == (32,) * 7
    assert arch.do_stable_layer_norm and arch.conv_bias

    qdir = tmp_path / "my-finetuned-whisper"
    qdir.mkdir()
    WhisperConfig(d_model=192, encoder_layers=2, encoder_attention_heads=3,
                  encoder_ffn_dim=384, num_mel_bins=128,
                  max_source_positions=750).save_pretrained(str(qdir))
    warch = whisper_arch_from_name(str(qdir))
    assert (warch.d_model, warch.num_layers, warch.num_heads) == (192, 2, 3)
    assert warch.num_mel_bins == 128 and warch.max_source_positions == 750

    # the TaggerArch.from_config path picks the dir name up end to end
    from wfl_asr_tpu.config import Config
    from wfl_asr_tpu.models.tagger import TaggerArch, init_tagger
    cfg = Config({"data": {}, "model": {"encoder_type": "wavlm",
                                        "wavlm_model": str(wdir),
                                        "num_languages": 1},
                  "training": {}, "output": {"save_dir": str(tmp_path)}})
    t_arch = TaggerArch.from_config(cfg, num_labels=5)
    assert t_arch.wavlm.hidden_size == 96 and t_arch.hidden_size == 96
    params, state = init_tagger(jax.random.PRNGKey(0), t_arch)
    assert params["encoder"]["layers"][0]["q"]["w"].shape == (96, 96)


def test_local_checkpoint_dir_wrong_model_type_raises(tmp_path):
    """Pointing wavlm_model at a whisper directory (or vice versa) must
    fail loudly: from_pretrained only WARNS on a model_type mismatch and
    would return default-valued config — a silently wrong-dimension
    arch."""
    import pytest
    from transformers import WavLMConfig, WhisperConfig
    from wfl_asr_tpu.models.tagger import wavlm_arch_from_name
    from wfl_asr_tpu.models.whisper import whisper_arch_from_name

    wdir = tmp_path / "a-whisper-ckpt"
    wdir.mkdir()
    WhisperConfig(d_model=192, encoder_layers=2, encoder_attention_heads=3,
                  encoder_ffn_dim=384).save_pretrained(str(wdir))
    with pytest.raises(ValueError, match="model_type='whisper'"):
        wavlm_arch_from_name(str(wdir))

    vdir = tmp_path / "a-wavlm-ckpt"
    vdir.mkdir()
    WavLMConfig(hidden_size=96, num_hidden_layers=3, num_attention_heads=4,
                intermediate_size=192).save_pretrained(str(vdir))
    with pytest.raises(ValueError, match="model_type='wavlm'"):
        whisper_arch_from_name(str(vdir))

"""Numeric parity of the on-device audio front-end vs HF / torch / scipy
oracles (constructed locally; no network)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from wfl_asr_tpu.ops import (
    whisper_log_mel, mel_spectrogram, wav2vec2_normalize, stft_power,
    mel_filterbank, median_filter_ids, confidence_gate_ids,
)


@pytest.fixture(scope="module")
def rng():
    return np.random.RandomState(0)


def test_whisper_log_mel_parity(rng):
    from transformers import WhisperFeatureExtractor
    fe = WhisperFeatureExtractor()  # defaults == whisper-base extractor config

    for dur_s in [1.3, 5.0, 31.0]:  # short (pad), mid, long (truncate)
        audio = (rng.randn(int(16000 * dur_s)) * 0.2).astype(np.float32)
        ref = fe(audio, sampling_rate=16000, return_tensors="np")["input_features"][0]
        ours = np.asarray(whisper_log_mel(jnp.asarray(audio[None, :]))[0])
        assert ours.shape == ref.shape == (80, 3000)
        np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-4)


def test_whisper_log_mel_batched_per_sample_max(rng):
    # The max-8 clamp must be per sample, not per batch.
    quiet = (rng.randn(16000) * 1e-3).astype(np.float32)
    loud = (rng.randn(16000) * 0.9).astype(np.float32)
    batch = np.asarray(whisper_log_mel(jnp.asarray(np.stack([quiet, loud]))))
    solo_q = np.asarray(whisper_log_mel(jnp.asarray(quiet[None])))[0]
    solo_l = np.asarray(whisper_log_mel(jnp.asarray(loud[None])))[0]
    np.testing.assert_allclose(batch[0], solo_q, atol=1e-6)
    np.testing.assert_allclose(batch[1], solo_l, atol=1e-6)


def test_mel_spectrogram_parity_torchaudio_semantics(rng):
    """Oracle = torch.stft + HTK mel bank with torchaudio's defaults
    (hann/center/reflect/power2, mel_scale='htk', norm=None), i.e. exactly
    what ``torchaudio.transforms.MelSpectrogram(sr, n_fft=400, hop, n_mels)``
    computes in reference model.py:85-91."""
    audio = (rng.randn(16000) * 0.3).astype(np.float32)
    n_fft, hop, n_mels = 400, 320, 80

    spec = torch.stft(torch.tensor(audio), n_fft=n_fft, hop_length=hop,
                      win_length=n_fft, window=torch.hann_window(n_fft),
                      center=True, pad_mode="reflect", normalized=False,
                      onesided=True, return_complex=True)
    power = spec.abs().pow(2.0).numpy()                      # [n_bins, T]
    fb = mel_filterbank(n_fft // 2 + 1, n_mels, 16000, scale="htk", norm=None)
    ref = (fb.T @ power).T                                   # [T, n_mels]

    ours = np.asarray(mel_spectrogram(jnp.asarray(audio[None]), 16000,
                                      n_fft, hop, n_mels))[0]
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=1e-2, rtol=1e-4)


def test_mel_filterbank_matches_torchaudio_formula():
    """HTK bank vs an independently-written torch oracle (melscale_fbanks
    formula)."""
    n_freqs, n_mels, sr = 201, 80, 16000
    all_freqs = torch.linspace(0, sr // 2, n_freqs)
    m_min = 2595.0 * np.log10(1.0 + 0.0 / 700.0)
    m_max = 2595.0 * np.log10(1.0 + (sr / 2) / 700.0)
    m_pts = torch.linspace(m_min, m_max, n_mels + 2)
    f_pts = 700.0 * (10 ** (m_pts / 2595.0) - 1.0)
    f_diff = f_pts[1:] - f_pts[:-1]
    slopes = f_pts.unsqueeze(0) - all_freqs.unsqueeze(1)
    down = (-1.0 * slopes[:, :-2]) / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    ref = torch.max(torch.zeros(1), torch.min(down, up)).numpy()

    ours = mel_filterbank(n_freqs, n_mels, sr, scale="htk", norm=None)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_wav2vec2_normalize_parity(rng):
    from transformers import Wav2Vec2FeatureExtractor
    fe = Wav2Vec2FeatureExtractor(do_normalize=True)
    # Padded batch, as the reference feeds it (model.py:159).
    batch = np.zeros((2, 16000), dtype=np.float32)
    batch[0] = rng.randn(16000) * 0.5
    batch[1, :8000] = rng.randn(8000) * 0.5  # zero-padded tail
    ref = fe(list(batch), sampling_rate=16000, return_tensors="np")["input_values"]
    ours = np.asarray(wav2vec2_normalize(jnp.asarray(batch)))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


@pytest.mark.parametrize("size", [2, 3, 4, 5, 7, 9])
def test_median_filter_parity(rng, size):
    from scipy.ndimage import median_filter
    ids = rng.randint(0, 12, size=137)
    ref = median_filter(ids, size=size)
    ours = np.asarray(median_filter_ids(jnp.asarray(ids), size))
    np.testing.assert_array_equal(ours, ref)


def test_median_filter_size1_noop(rng):
    ids = rng.randint(0, 5, size=20)
    np.testing.assert_array_equal(np.asarray(median_filter_ids(jnp.asarray(ids), 1)), ids)


def test_confidence_gate_parity(rng):
    logits = rng.randn(50, 9).astype(np.float32) * 2
    o_id = 4
    probs = torch.softmax(torch.tensor(logits), dim=-1)
    max_probs, pred = torch.max(probs, dim=-1)
    ref = np.where(max_probs.numpy() < 0.5, o_id, pred.numpy())
    ours = np.asarray(confidence_gate_ids(jnp.asarray(logits),
                                          jnp.float32(0.5), o_id))
    np.testing.assert_array_equal(ours, ref)


def test_stft_power_vs_torch(rng):
    audio = (rng.randn(4000) * 0.3).astype(np.float32)
    spec = torch.stft(torch.tensor(audio), n_fft=400, hop_length=160,
                      window=torch.hann_window(400), center=True,
                      pad_mode="reflect", return_complex=True)
    ref = spec.abs().pow(2).numpy().T                        # [T, n_bins]
    ours = np.asarray(stft_power(jnp.asarray(audio[None])))[0]
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-4)

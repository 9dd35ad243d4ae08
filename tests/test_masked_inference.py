"""Bucketed static-shape inference with masks must reproduce exact-length
runs on valid frames (the mechanism that keeps the TPU graph static while
preserving .lab parity)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wfl_asr_tpu.models.tagger import TaggerArch, apply_tagger, init_tagger
from wfl_asr_tpu.models.wavlm import WavLMArch


@pytest.fixture(scope="module", autouse=True)
def f32_matmuls():
    with jax.default_matmul_precision("highest"):
        yield


def small_arch(encoder_type):
    wavlm = WavLMArch(hidden_size=64, num_layers=2, num_heads=4,
                      intermediate_size=128, conv_dim=(32, 32, 32),
                      conv_kernel=(10, 3, 3), conv_stride=(5, 2, 2),
                      num_conv_pos_embeddings=16,
                      num_conv_pos_embedding_groups=4,
                      num_buckets=40, max_distance=100) \
        if encoder_type == "wavlm" else None
    hidden = 64 if encoder_type == "wavlm" else 80
    return TaggerArch(encoder_type=encoder_type, num_labels=7,
                      num_languages=2, hidden_size=hidden, lang_emb_dim=8,
                      enable_bilstm=True, bilstm_num_layers=2,
                      num_conformer_layers=2, conformer_heads=2,
                      conformer_ff_expansion=2, conformer_kernel=31,
                      enable_dilated_conv=True, dilated_depth=2,
                      dilated_kernel=3, wavlm=wavlm)


def wavlm_frames(arch, s):
    return arch.wavlm.feature_lengths(s)


def test_wavlm_bucketed_equals_exact():
    arch = small_arch("wavlm")
    params, state = init_tagger(jax.random.PRNGKey(0), arch)

    rng = np.random.RandomState(0)
    s_true = 5000
    audio = (rng.randn(s_true) * 0.3).astype(np.float32)
    lang = jnp.asarray([1])

    t_ref = wavlm_frames(arch, s_true)
    exact_logits, exact_offsets, _ = apply_tagger(
        params, state, arch, jnp.asarray(audio[None]), lang)
    assert exact_logits.shape[1] == t_ref

    bucket = 8000
    padded = np.zeros((1, bucket), np.float32)
    padded[0, :s_true] = audio
    t_pad = wavlm_frames(arch, bucket)
    sample_mask = jnp.asarray((np.arange(bucket) < s_true)[None])
    frame_mask = jnp.asarray((np.arange(t_pad) < t_ref)[None])

    logits, offsets, _ = apply_tagger(
        params, state, arch, jnp.asarray(padded), lang,
        sample_mask=sample_mask, frame_mask=frame_mask)

    np.testing.assert_allclose(np.asarray(logits)[:, :t_ref],
                               np.asarray(exact_logits), atol=3e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(offsets)[:, :t_ref],
                               np.asarray(exact_offsets), atol=3e-5, rtol=1e-5)


def test_mel_bucketed_equals_exact():
    arch = small_arch("none")
    params, state = init_tagger(jax.random.PRNGKey(1), arch)

    rng = np.random.RandomState(2)
    s_true = 9000
    audio = (rng.randn(s_true) * 0.3).astype(np.float32)
    lang = jnp.asarray([0])

    t_ref = s_true // 320 + 1
    exact_logits, exact_offsets, _ = apply_tagger(
        params, state, arch, jnp.asarray(audio[None]), lang)
    assert exact_logits.shape[1] == t_ref

    # Host-side center padding (reflect 200 each side), then zero-pad the
    # bucket; device STFT runs center=False.
    bucket = 16000
    centered = np.pad(audio, 200, mode="reflect")
    padded = np.zeros((1, bucket + 400), np.float32)
    padded[0, :len(centered)] = centered
    t_pad = bucket // 320 + 1
    frame_mask = jnp.asarray((np.arange(t_pad) < t_ref)[None])

    logits, offsets, _ = apply_tagger(
        params, state, arch, jnp.asarray(padded), lang,
        frame_mask=frame_mask, precentered=True)

    np.testing.assert_allclose(np.asarray(logits)[:, :t_ref],
                               np.asarray(exact_logits), atol=3e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(offsets)[:, :t_ref],
                               np.asarray(exact_offsets), atol=3e-5, rtol=1e-5)

"""On-device audio front-end: fused STFT → mel → log, as XLA-friendly matmuls.

The reference runs feature extraction **on CPU inside forward()** (quirk Q5:
model.py:153-159 round-trips device→host→device through HF numpy extractors;
the ``encoder_type: none`` path uses ``torchaudio.transforms.MelSpectrogram``,
model.py:85-91). Here the whole front-end runs on device:

- STFT is expressed as a single strided convolution whose filters are the
  windowed DFT basis — one MXU-shaped matmul instead of FFT butterflies
  (n_fft=400 is tiny; the matmul form fuses with the mel projection).
- Mel projection is a second matmul; log/clamp fuse into it.

Numeric contracts:

- ``whisper_log_mel`` matches HF ``WhisperFeatureExtractor`` (pad/truncate to
  30 s, slaney mel, log10, per-sample max-8 clamp, (x+4)/4).
- ``mel_spectrogram`` matches ``torchaudio.transforms.MelSpectrogram`` with
  the reference's arguments (n_fft=400, hop=frame_duration*sr, HTK mel,
  no norm, power=2, center/reflect).
- ``wav2vec2_normalize`` matches HF ``Wav2Vec2FeatureExtractor``'s
  zero-mean/unit-variance normalization as the reference invokes it (over the
  full zero-padded row, no attention mask — model.py:159).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

WHISPER_N_FFT = 400
WHISPER_HOP = 160
WHISPER_N_MELS = 80
WHISPER_N_SAMPLES = 480_000          # 30 s @ 16 kHz
WHISPER_N_FRAMES = 3000              # feature frames after last-frame drop


# ---------------------------------------------------------------------------
# Mel filterbank (host-side constant construction, cached)
# ---------------------------------------------------------------------------

def _hz_to_mel(freq: np.ndarray, scale: str) -> np.ndarray:
    freq = np.asarray(freq, dtype=np.float64)
    if scale == "htk":
        return 2595.0 * np.log10(1.0 + freq / 700.0)
    # slaney: linear below 1 kHz, log above
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (freq - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(freq >= min_log_hz,
                    min_log_mel + np.log(np.maximum(freq, 1e-10) / min_log_hz) / logstep,
                    mels)


def _mel_to_hz(mels: np.ndarray, scale: str) -> np.ndarray:
    mels = np.asarray(mels, dtype=np.float64)
    if scale == "htk":
        return 700.0 * (10.0 ** (mels / 2595.0) - 1.0)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(mels >= min_log_mel,
                    min_log_hz * np.exp(logstep * (mels - min_log_mel)),
                    freqs)


@functools.lru_cache(maxsize=16)
def mel_filterbank(n_freqs: int, n_mels: int, sample_rate: int,
                   fmin: float = 0.0, fmax: Optional[float] = None,
                   scale: str = "htk", norm: Optional[str] = None) -> np.ndarray:
    """Triangular mel filterbank, shape [n_freqs, n_mels] (float32).

    ``scale="slaney", norm="slaney"`` reproduces HF/librosa's Whisper bank;
    ``scale="htk", norm=None`` reproduces torchaudio's default.
    """
    if fmax is None:
        fmax = sample_rate / 2.0
    all_freqs = np.linspace(0, sample_rate / 2.0, n_freqs)
    mel_pts = np.linspace(_hz_to_mel(np.array(fmin), scale),
                          _hz_to_mel(np.array(fmax), scale), n_mels + 2)
    f_pts = _mel_to_hz(mel_pts, scale)

    f_diff = np.diff(f_pts)                                  # [n_mels+1]
    slopes = f_pts[None, :] - all_freqs[:, None]             # [n_freqs, n_mels+2]
    down = -slopes[:, :-2] / f_diff[None, :-1]
    up = slopes[:, 2:] / f_diff[None, 1:]
    fb = np.maximum(0.0, np.minimum(down, up))               # [n_freqs, n_mels]

    if norm == "slaney":
        enorm = 2.0 / (f_pts[2:n_mels + 2] - f_pts[:n_mels])
        fb = fb * enorm[None, :]
    return fb.astype(np.float32)


# ---------------------------------------------------------------------------
# STFT as a strided convolution over the windowed DFT basis
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=8)
def _dft_window_basis(n_fft: int, window: str = "hann") -> np.ndarray:
    """Windowed DFT basis, shape [2 * n_bins, n_fft] — rows are
    cos(2πkn/N)·w(n) then -sin(2πkn/N)·w(n)."""
    n_bins = n_fft // 2 + 1
    n = np.arange(n_fft)
    k = np.arange(n_bins)[:, None]
    angle = 2.0 * np.pi * k * n[None, :] / n_fft
    if window == "hann":
        # periodic Hann, matching torch.hann_window(window_length) default
        win = 0.5 * (1.0 - np.cos(2.0 * np.pi * n / n_fft))
    elif window == "ones":
        win = np.ones(n_fft)
    else:
        raise ValueError(f"unknown window {window}")
    basis = np.concatenate([np.cos(angle), -np.sin(angle)], axis=0) * win[None, :]
    return basis.astype(np.float32)


def stft_power(x: jnp.ndarray, n_fft: int = WHISPER_N_FFT,
               hop: int = WHISPER_HOP, center: bool = True,
               window: str = "hann",
               compute_dtype=jnp.float32) -> jnp.ndarray:
    """Power spectrogram |STFT|², shape [B, n_frames, n_fft//2+1].

    ``center=True`` reflect-pads n_fft//2 on each side (torch.stft default),
    giving ``n_frames = 1 + S // hop``.
    """
    if x.ndim == 1:
        x = x[None, :]
    if center:
        pad = n_fft // 2
        x = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")

    basis = jnp.asarray(_dft_window_basis(n_fft, window), dtype=compute_dtype)
    # Strided conv: input [B, 1, S], filters [2*n_bins, 1, n_fft], stride hop.
    out = jax.lax.conv_general_dilated(
        x[:, None, :].astype(compute_dtype),
        basis[:, None, :],
        window_strides=(hop,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32,
        # Full f32 multiplies: the front-end is parity-sensitive and a tiny
        # fraction of total FLOPs; TPU's default bf16 passes cost ~1e-3 in
        # the log-mel.
        precision=jax.lax.Precision.HIGHEST,
    )                                                        # [B, 2*n_bins, T]
    n_bins = n_fft // 2 + 1
    real, imag = out[:, :n_bins, :], out[:, n_bins:, :]
    power = real * real + imag * imag                        # [B, n_bins, T]
    return jnp.transpose(power, (0, 2, 1))                   # [B, T, n_bins]


# ---------------------------------------------------------------------------
# Whisper-compatible log-mel
# ---------------------------------------------------------------------------

def pad_or_truncate(x: jnp.ndarray, length: int) -> jnp.ndarray:
    """Zero-pad or truncate the time axis of [B, S] to ``length``."""
    if x.ndim == 1:
        x = x[None, :]
    s = x.shape[-1]
    if s > length:
        return x[:, :length]
    if s < length:
        return jnp.pad(x, ((0, 0), (0, length - s)))
    return x


@functools.partial(jax.jit, static_argnames=("n_mels", "compute_dtype"))
def whisper_log_mel(audio: jnp.ndarray, n_mels: int = WHISPER_N_MELS,
                    compute_dtype=jnp.float32) -> jnp.ndarray:
    """HF ``WhisperFeatureExtractor``-compatible log-mel, fully on device.

    Input [B, S] (any S) → output [B, n_mels, 3000]: pad/truncate to 30 s,
    STFT (hann, 400/160, center), slaney mel, log10 with 1e-10 floor,
    per-sample clamp to max-8, then (x+4)/4. The final STFT frame is dropped,
    matching the extractor.
    """
    audio = pad_or_truncate(audio, WHISPER_N_SAMPLES)
    power = stft_power(audio, WHISPER_N_FFT, WHISPER_HOP,
                       compute_dtype=compute_dtype)           # [B, 3001, 201]
    power = power[:, :-1, :]                                  # drop last frame
    fb = jnp.asarray(mel_filterbank(WHISPER_N_FFT // 2 + 1, n_mels, 16000,
                                    0.0, 8000.0, scale="slaney", norm="slaney"))
    mel = jnp.einsum("btf,fm->btm", power, fb,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    per_sample_max = jnp.max(log_spec, axis=(1, 2), keepdims=True)
    log_spec = jnp.maximum(log_spec, per_sample_max - 8.0)
    log_spec = (log_spec + 4.0) / 4.0
    return jnp.transpose(log_spec, (0, 2, 1))                 # [B, n_mels, T]


# ---------------------------------------------------------------------------
# torchaudio-compatible MelSpectrogram (encoder_type: none path)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("sample_rate", "n_fft", "hop",
                                              "n_mels", "center"))
def mel_spectrogram(audio: jnp.ndarray, sample_rate: int = 16000,
                    n_fft: int = 400, hop: int = 320,
                    n_mels: int = 80, center: bool = True) -> jnp.ndarray:
    """``torchaudio.transforms.MelSpectrogram`` defaults as the reference
    instantiates it (model.py:85-91): hann/center/reflect, power=2, HTK mel,
    no norm, fmin 0, fmax sr/2. Output [B, T, n_mels] (already transposed to
    time-major as model.py:150 does).

    ``center=False`` is for bucket-padded inference where the exact-length
    reflect padding was already applied on host (so tail frames match an
    exact-length run)."""
    power = stft_power(audio, n_fft, hop, center=center)      # [B, T, n_bins]
    fb = jnp.asarray(mel_filterbank(n_fft // 2 + 1, n_mels, sample_rate,
                                    scale="htk", norm=None))
    return jnp.einsum("btf,fm->btm", power, fb,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)


# ---------------------------------------------------------------------------
# Wav2Vec2 normalization (WavLM path)
# ---------------------------------------------------------------------------

@jax.jit
def wav2vec2_normalize(audio: jnp.ndarray) -> jnp.ndarray:
    """Zero-mean unit-variance per row, over the **full padded row** — exactly
    how the reference feeds its padded batch to ``Wav2Vec2FeatureExtractor``
    without an attention mask (model.py:159; HF uses variance eps 1e-7)."""
    if audio.ndim == 1:
        audio = audio[None, :]
    mean = jnp.mean(audio, axis=-1, keepdims=True)
    var = jnp.var(audio, axis=-1, keepdims=True)
    return (audio - mean) / jnp.sqrt(var + 1e-7)


@jax.jit
def wav2vec2_normalize_masked(audio: jnp.ndarray,
                              sample_mask: jnp.ndarray) -> jnp.ndarray:
    """Per-row zero-mean/unit-variance using statistics over **valid samples
    only** — for bucket-padded single-utterance inference, where the
    reference normalizes the exact-length row (infer.py B=1 forward)."""
    if audio.ndim == 1:
        audio = audio[None, :]
    m = sample_mask.astype(jnp.float32)
    count = jnp.maximum(jnp.sum(m, axis=-1, keepdims=True), 1.0)
    mean = jnp.sum(audio * m, axis=-1, keepdims=True) / count
    var = jnp.sum(jnp.square(audio - mean) * m, axis=-1, keepdims=True) / count
    return (audio - mean) / jnp.sqrt(var + 1e-7)

"""Native WAV I/O: format coverage, header-only duration, resampling."""

import struct
import wave

import numpy as np
import pytest

from wfl_asr_tpu.data.audio import (peak_normalize, read_wav, resample,
                                    wav_duration, write_wav)


def _write_pcm(path, samples, sr, width, channels=1):
    pcm = samples
    with wave.open(str(path), "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(width)
        w.setframerate(sr)
        w.writeframes(pcm)


def test_pcm16_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    x = (rng.randn(5000) * 0.3).clip(-1, 1)
    path = tmp_path / "a.wav"
    write_wav(str(path), x, 16000)
    y, sr = read_wav(str(path))
    assert sr == 16000
    # write truncates to int16 and scales by 32767; read divides by 32768
    np.testing.assert_allclose(y, x, atol=1e-4)


def test_pcm24_and_32_and_float(tmp_path):
    rng = np.random.RandomState(1)
    x = (rng.randn(1000) * 0.3).clip(-1, 1)

    # 24-bit PCM
    as24 = np.clip((x * (1 << 23)).astype(np.int32),
                   -(1 << 23), (1 << 23) - 1)  # 24-bit range
    raw = b"".join(struct.pack("<i", v)[:3] for v in as24)
    _write_pcm(tmp_path / "p24.wav", raw, 22050, 3)
    y, sr = read_wav(str(tmp_path / "p24.wav"))
    assert sr == 22050
    np.testing.assert_allclose(y, x, atol=5e-7)

    # 32-bit PCM
    raw32 = (x * 2147483647).astype("<i4").tobytes()
    _write_pcm(tmp_path / "p32.wav", raw32, 8000, 4)
    y, _ = read_wav(str(tmp_path / "p32.wav"))
    np.testing.assert_allclose(y, x, atol=1e-8)

    # IEEE float32 (hand-built header)
    f32 = x.astype("<f4").tobytes()
    with open(tmp_path / "f32.wav", "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 36 + len(f32)) + b"WAVE")
        f.write(b"fmt " + struct.pack("<IHHIIHH", 16, 3, 1, 44100,
                                      44100 * 4, 4, 32))
        f.write(b"data" + struct.pack("<I", len(f32)) + f32)
    y, sr = read_wav(str(tmp_path / "f32.wav"))
    assert sr == 44100
    np.testing.assert_allclose(y, x, atol=1e-7)


def test_stereo(tmp_path):
    rng = np.random.RandomState(2)
    x = (rng.randn(500, 2) * 0.2).clip(-1, 1)
    write_wav(str(tmp_path / "st.wav"), x, 16000)
    y, _ = read_wav(str(tmp_path / "st.wav"))
    assert y.shape == (500, 2)
    np.testing.assert_allclose(y, x, atol=1e-4)


def test_wav_duration_header_only(tmp_path):
    x = np.zeros(12345)
    write_wav(str(tmp_path / "d.wav"), x, 16000)
    n, sr = wav_duration(str(tmp_path / "d.wav"))
    assert (n, sr) == (12345, 16000)


def test_resample_matches_scipy_tone():
    sr_in, sr_out = 44100, 16000
    t = np.arange(sr_in) / sr_in
    x = np.sin(2 * np.pi * 440 * t)
    y = resample(x, sr_in, sr_out)
    assert abs(len(y) - sr_out) <= 1
    # the tone survives: dominant FFT bin ≈ 440 Hz
    spec = np.abs(np.fft.rfft(y[:sr_out]))
    peak_hz = np.argmax(spec) * sr_out / len(y[:sr_out])
    assert abs(peak_hz - 440) < 2


def test_peak_normalize_silence_passthrough():
    silent = np.zeros(100)
    np.testing.assert_array_equal(peak_normalize(silent), silent)
    x = np.array([0.5, -0.25])
    np.testing.assert_allclose(peak_normalize(x), [1.0, -0.5])
    np.testing.assert_allclose(peak_normalize(x, eps=1e-8),
                               x / (0.5 + 1e-8))


def test_malformed_wav_raises(tmp_path):
    (tmp_path / "bad.wav").write_bytes(b"not a wav at all")
    with pytest.raises(ValueError):
        read_wav(str(tmp_path / "bad.wav"))

"""correct_label tool: golden snap-logic parity vs the reference (librosa
stubbed out — the snap path is pure Python), behavioral boundary detection,
and the file protocol (cache create/use/delete, in-place .lab rewrite)."""

import importlib
import os
import random
import sys

import numpy as np
import pytest

from wfl_asr_tpu import correct_label as CL
from wfl_asr_tpu.data.audio import write_wav
from wfl_asr_tpu.labels import save_lab


@pytest.fixture(scope="module")
def reference_correct_label(reference_oracle):
    sys.path.insert(0, "/root/reference")
    try:
        if "correct_label" in sys.modules:
            del sys.modules["correct_label"]
        mod = importlib.import_module("correct_label")
        yield mod
    finally:
        sys.path.remove("/root/reference")
        sys.modules.pop("correct_label", None)


@pytest.mark.parametrize("seed", range(6))
def test_snap_parity(reference_correct_label, tmp_path, seed):
    rng = random.Random(seed)
    wav_path = str(tmp_path / f"s{seed}.wav")
    # .lab with a few segments
    segs, t = [], 0.0
    for _ in range(rng.randint(1, 8)):
        d = rng.uniform(0.05, 0.4)
        segs.append((t, t + d, rng.choice("abc")))
        t += d
    save_lab(wav_path.replace(".wav", ".lab"), segs)

    boundaries = sorted(rng.uniform(0, t + 0.2) for _ in range(rng.randint(0, 12)))

    ours = CL.correct_lab_boundaries(wav_path, list(boundaries))
    ref = reference_correct_label.correct_lab_boundaries(wav_path,
                                                         list(boundaries))
    assert ours == ref


def test_detect_boundaries_finds_transition(tmp_path):
    """A silence→tone→silence signal must yield a candidate near each
    transition."""
    sr = 16000
    y = np.zeros(sr)
    y[4800:11200] = 0.6 * np.sin(2 * np.pi * 440 *
                                 np.arange(6400) / sr)
    times, flux, delta_mag, flux_times = CL.detect_boundaries(y, sr)
    assert len(times) >= 2
    assert any(abs(t - 0.3) < 0.05 for t in times), times
    assert any(abs(t - 0.7) < 0.05 for t in times), times
    assert len(flux) == len(delta_mag) == len(flux_times)


def test_process_file_protocol(tmp_path):
    sr = 16000
    y = np.zeros(sr)
    y[4800:11200] = 0.6 * np.sin(2 * np.pi * 440 * np.arange(6400) / sr)
    wav_path = str(tmp_path / "u.wav")
    write_wav(wav_path, y, sr)
    # ground truth .lab slightly off the true transition
    save_lab(wav_path.replace(".wav", ".lab"),
             [(0.0, 0.285, "SP"), (0.285, 0.69, "a"), (0.69, 1.0, "SP")])

    CL.process_file(wav_path, save_plot=True)

    # boundary cache deleted, .lab rewritten, PNG created
    assert not os.path.exists(wav_path.replace(".wav", "_boundary.txt"))
    assert os.path.exists(wav_path.replace(".wav", ".png"))
    lines = open(wav_path.replace(".wav", ".lab")).read().splitlines()
    assert len(lines) == 3
    # the 0.285 boundary snapped toward the true 0.3 transition
    b01 = int(lines[0].split()[1]) / 1e7
    assert b01 != 0.285 and abs(b01 - 0.3) < 0.03

    # pre-made boundary file is used when present
    CL.write_predicted_boundaries(wav_path, [0.5])
    CL.process_file(wav_path)
    assert not os.path.exists(wav_path.replace(".wav", "_boundary.txt"))


def test_cli_folder_mode(tmp_path):
    sr = 16000
    for name in ("a", "b"):
        y = np.zeros(sr // 2)
        y[2000:4000] = 0.5 * np.sin(2 * np.pi * 300 * np.arange(2000) / sr)
        write_wav(str(tmp_path / f"{name}.wav"), y, sr)
        save_lab(str(tmp_path / f"{name}.lab"), [(0.0, 0.12, "x"),
                                                 (0.12, 0.5, "y")])
    import subprocess
    result = subprocess.run(
        [sys.executable, "correct_label.py", str(tmp_path)],
        capture_output=True, text=True, cwd="/root/repo",
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert result.returncode == 0, result.stderr
    assert "complete" in result.stdout


# ---------------------------------------------------------------------------
# librosa-math golden parity (VERDICT r1 #7)
#
# librosa is not installed, so the oracle below is an independent
# transcription of the exact code paths the reference hits
# (librosa==0.11 per /root/reference/requirements.txt):
#   librosa.stft(y, n_fft, hop_length)          -> center=True, hann
#                                                  (periodic), pad_mode
#                                                  'constant', win=n_fft
#   librosa.feature.mfcc(y, sr, 13, hop_length) -> melspectrogram(n_fft=2048,
#                                                  power=2, n_mels=128,
#                                                  slaney mel + slaney norm)
#                                                  -> power_to_db(ref=1,
#                                                  amin=1e-10, top_db=80)
#                                                  -> fftpack dct-II ortho
#   librosa.feature.delta(mfcc)                 -> savgol(width=9,
#                                                  polyorder=order=1,
#                                                  deriv=1, mode='interp')
#   librosa.frames_to_time(f, sr, hop)          -> f*hop/sr
# The oracle is written from librosa's own construction (ramps loop,
# hz<->mel piecewise-slaney), NOT from wfl_asr_tpu code, so a shared
# misreading would show up as a mismatch.
# ---------------------------------------------------------------------------

def _oracle_hz_to_mel(freqs):
    freqs = np.asarray(freqs, np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (freqs - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(freqs >= min_log_hz,
                    min_log_mel + np.log(np.maximum(freqs, 1e-30)
                                         / min_log_hz) / logstep,
                    mels)


def _oracle_mel_to_hz(mels):
    mels = np.asarray(mels, np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(mels >= min_log_mel,
                    min_log_hz * np.exp(logstep * (mels - min_log_mel)),
                    freqs)


def _oracle_mel_fb(sr, n_fft, n_mels):
    """librosa.filters.mel(sr, n_fft, n_mels) transcription (slaney scale +
    slaney norm defaults); returns [n_mels, 1 + n_fft//2]."""
    fmax = sr / 2.0
    fftfreqs = np.fft.rfftfreq(n=n_fft, d=1.0 / sr)
    mel_f = _oracle_mel_to_hz(np.linspace(_oracle_hz_to_mel(0.0),
                                          _oracle_hz_to_mel(fmax),
                                          n_mels + 2))
    fdiff = np.diff(mel_f)
    ramps = np.subtract.outer(mel_f, fftfreqs)
    weights = np.zeros((n_mels, len(fftfreqs)))
    for i in range(n_mels):
        lower = -ramps[i] / fdiff[i]
        upper = ramps[i + 2] / fdiff[i + 1]
        weights[i] = np.maximum(0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_f[2:n_mels + 2] - mel_f[:n_mels])
    return weights * enorm[:, None]


def _oracle_stft_mag(y, n_fft, hop):
    """|librosa.stft| transcription: centered constant pad, periodic hann,
    win_length = n_fft. Returns [1 + n_fft//2, n_frames]."""
    import scipy.signal
    window = scipy.signal.get_window("hann", n_fft, fftbins=True)
    y_pad = np.pad(y, n_fft // 2, mode="constant")
    n_frames = 1 + (len(y_pad) - n_fft) // hop
    frames = np.lib.stride_tricks.as_strided(
        y_pad, shape=(n_frames, n_fft),
        strides=(y_pad.strides[0] * hop, y_pad.strides[0]))
    return np.abs(np.fft.rfft(frames * window, axis=1)).T


def _oracle_mfcc(y, sr, n_mfcc, hop):
    import scipy.fftpack
    S = _oracle_stft_mag(y, 2048, hop) ** 2
    mel = _oracle_mel_fb(sr, 2048, 128) @ S
    # power_to_db(ref=1.0, amin=1e-10, top_db=80)
    log_spec = 10.0 * np.log10(np.maximum(1e-10, mel))
    log_spec = np.maximum(log_spec, log_spec.max() - 80.0)
    return scipy.fftpack.dct(log_spec, axis=-2, type=2,
                             norm="ortho")[:n_mfcc]


def _oracle_detect(y, sr, frame_length=512, hop_length=160,
                   flux_threshold=0.1, delta_window=5):
    import scipy.signal
    S = _oracle_stft_mag(y, frame_length, hop_length)
    flux = np.sqrt(np.sum(np.diff(S, axis=1) ** 2, axis=0))
    flux = np.pad(flux, (1,), mode="constant")
    flux = flux / np.max(flux)
    mfcc = _oracle_mfcc(y, sr, 13, hop_length)
    delta = scipy.signal.savgol_filter(mfcc, 9, polyorder=1, deriv=1,
                                       axis=-1, mode="interp")
    delta_mag = np.mean(np.abs(delta), axis=0)
    delta_mag = delta_mag / np.max(delta_mag)
    n = min(len(flux), len(delta_mag))
    combined = 0.5 * flux[:n] + 0.5 * delta_mag[:n]
    peaks, _ = scipy.signal.find_peaks(combined, height=flux_threshold,
                                       distance=delta_window)
    shifted = np.clip(peaks - 1, 0, n - 1)
    return (shifted * hop_length / sr).tolist(), flux[:n], delta_mag[:n]


def _dsp_fixture_signals():
    rng = np.random.RandomState(21)
    sr = 16000
    t = np.arange(sr * 2) / sr
    sigs = []
    # tone -> noise -> tone transitions
    s = np.where(t < 0.7, np.sin(2 * np.pi * 220 * t),
                 np.where(t < 1.3, rng.randn(len(t)) * 0.3,
                          np.sin(2 * np.pi * 880 * t))).astype(np.float32)
    sigs.append(s)
    # chirp with amplitude bursts
    s2 = (np.sin(2 * np.pi * (100 + 400 * t) * t)
          * (0.2 + 0.8 * (np.sin(2 * np.pi * 3 * t) > 0))).astype(np.float32)
    sigs.append(s2)
    # speech-ish filtered noise with silences
    s3 = rng.randn(len(t)).astype(np.float32) * 0.5
    s3[int(0.5 * sr):int(0.8 * sr)] = 0.0
    s3[int(1.4 * sr):int(1.6 * sr)] *= 0.05
    sigs.append(s3)
    return sr, sigs


@pytest.mark.parametrize("idx", [0, 1, 2])
def test_detect_boundaries_matches_librosa_math(idx):
    sr, sigs = _dsp_fixture_signals()
    y = sigs[idx]
    want_times, want_flux, want_delta = _oracle_detect(y, sr)
    got_times, got_flux, got_delta, got_ft = CL.detect_boundaries(y, sr)

    np.testing.assert_allclose(got_flux, want_flux, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(got_delta, want_delta, rtol=1e-5, atol=1e-7)
    assert got_times == pytest.approx(want_times)
    assert len(want_times) >= 2  # fixtures actually produce boundaries
    np.testing.assert_allclose(
        got_ft, np.arange(len(want_flux)) * 160 / sr)


def test_mel_fb_matches_librosa_construction():
    from wfl_asr_tpu.ops.frontend import mel_filterbank
    ours = mel_filterbank(1025, 128, 16000, scale="slaney",
                          norm="slaney").T  # [n_mels, n_freqs]
    oracle = _oracle_mel_fb(16000, 2048, 128)
    np.testing.assert_allclose(ours, oracle, rtol=2e-5, atol=1e-8)

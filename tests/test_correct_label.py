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

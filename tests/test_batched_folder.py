"""Batched folder inference must produce byte-identical .lab outputs to the
per-file path (files of different lengths share one masked forward)."""

import os
import sys

import numpy as np
import pytest

from tests.test_tagger import reference_tagger_module  # noqa: F401
from tests.test_infer_e2e import _setup_run, _our_session
from wfl_asr_tpu.data.audio import write_wav


def test_batched_folder_matches_per_file(reference_tagger_module, tmp_path):
    ref_model, _, _ = reference_tagger_module
    labels, config, config_path, ckpt_path, _ = _setup_run(
        ref_model, tmp_path, "none", "batched")

    rng = np.random.RandomState(9)
    folder_a = tmp_path / "per_file"
    folder_b = tmp_path / "batched"
    folder_a.mkdir(); folder_b.mkdir()
    durations = [0.7, 1.3, 2.1, 0.5]
    for i, dur in enumerate(durations):
        audio = (rng.randn(int(16000 * dur)) * 0.4)
        for d in (folder_a, folder_b):
            write_wav(str(d / f"u{i}.wav"), audio, 16000)
    # one file with a forced phoneme list
    (folder_a / "u1.txt").write_text("p0 p2\n")
    (folder_b / "u1.txt").write_text("p0 p2\n")

    _our_session(config_path, ckpt_path, "none", labels)
    from wfl_asr_tpu.infer import infer_folder, infer_folder_batched

    out_a = str(tmp_path / "out_a")
    out_b = str(tmp_path / "out_b")
    infer_folder(str(folder_a), config_path, ckpt_path, out_a,
                 lang_id=0, confidence_threshold=0.3)
    infer_folder_batched(str(folder_b), config_path, ckpt_path, out_b,
                         lang_id=0, confidence_threshold=0.3, batch_files=3)

    for i in range(len(durations)):
        a = open(os.path.join(out_a, f"u{i}.lab")).read()
        b = open(os.path.join(out_b, f"u{i}.lab")).read()
        assert a == b, f"u{i}"

    # second batched run hits the cache and stays identical
    out_c = str(tmp_path / "out_c")
    infer_folder_batched(str(folder_b), config_path, ckpt_path, out_c,
                         lang_id=0, confidence_threshold=0.3, batch_files=3)
    for i in range(len(durations)):
        assert open(os.path.join(out_b, f"u{i}.lab")).read() == \
            open(os.path.join(out_c, f"u{i}.lab")).read()


def test_batched_folder_lang_averaging(reference_tagger_module, tmp_path):
    ref_model, _, _ = reference_tagger_module
    labels, config, config_path, ckpt_path, _ = _setup_run(
        ref_model, tmp_path, "none", "batchavg")
    rng = np.random.RandomState(10)
    folder_a = tmp_path / "pf"; folder_b = tmp_path / "bt"
    folder_a.mkdir(); folder_b.mkdir()
    for i in range(2):
        audio = (rng.randn(int(16000 * 0.9)) * 0.4)
        write_wav(str(folder_a / f"v{i}.wav"), audio, 16000)
        write_wav(str(folder_b / f"v{i}.wav"), audio, 16000)

    _our_session(config_path, ckpt_path, "none", labels)
    from wfl_asr_tpu.infer import infer_folder, infer_folder_batched
    out_a = str(tmp_path / "oa"); out_b = str(tmp_path / "ob")
    infer_folder(str(folder_a), config_path, ckpt_path, out_a,
                 lang_id=None, confidence_threshold=0.5)
    infer_folder_batched(str(folder_b), config_path, ckpt_path, out_b,
                         lang_id=None, confidence_threshold=0.5,
                         batch_files=2)
    for i in range(2):
        assert open(os.path.join(out_a, f"v{i}.lab")).read() == \
            open(os.path.join(out_b, f"v{i}.lab")).read()


def test_session_cache_reused_with_data_parallel_single_device(monkeypatch):
    """data_parallel=True on a single-device host must reuse the cached
    mesh-less session instead of rebuilding (and recompiling) per call."""
    from wfl_asr_tpu.infer import pipeline as P

    class _Fake:
        mesh = None

    key = ("/tmp/_fake_cfg_x", "/tmp/_fake_ckpt_x")
    sentinel = _Fake()
    P._SESSION_CACHE[key] = sentinel
    monkeypatch.setattr(P.jax, "devices", lambda: [object()])  # 1 device
    try:
        got = P._get_session(key[0], key[1], data_parallel=True)
        assert got is sentinel  # one device: cached session is correct
    finally:
        del P._SESSION_CACHE[key]

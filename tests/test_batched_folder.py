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


def test_long_replacement_file_not_shadowed_by_stale_cache(
        reference_tagger_module, tmp_path, monkeypatch):
    """A >MAX_SEGMENT_DURATION file must reach the chunked path even when a
    stale non-chunked cache entry exists under its name (r3 review: the
    cache check was briefly ordered before the duration gate)."""
    ref_model, _, _ = reference_tagger_module
    labels, config, config_path, ckpt_path, _ = _setup_run(
        ref_model, tmp_path, "none", "stalecache")
    rng = np.random.RandomState(5)
    folder = tmp_path / "stale"
    folder.mkdir()
    write_wav(str(folder / "u.wav"), rng.randn(8000) * 0.4, 16000)  # 0.5 s
    _our_session(config_path, ckpt_path, "none", labels)
    from wfl_asr_tpu.infer import infer_folder_batched
    from wfl_asr_tpu.infer import pipeline as P

    out1 = str(tmp_path / "stale_out1")
    infer_folder_batched(str(folder), config_path, ckpt_path, out1,
                         lang_id=0, confidence_threshold=0.0)
    assert (folder / ".wfl_cache" / "u_lang0_logits.pt").exists()

    # replace with a longer file and force it over the duration limit
    write_wav(str(folder / "u.wav"), rng.randn(32000) * 0.4, 16000)  # 2 s
    monkeypatch.setattr(P, "MAX_SEGMENT_DURATION", 1.0)
    out2 = str(tmp_path / "stale_out2")
    infer_folder_batched(str(folder), config_path, ckpt_path, out2,
                         lang_id=0, confidence_threshold=0.0)
    # the chunked path ran (its _seg{N} cache keys appear) and the output
    # covers the full 2 s file, not the stale 0.5 s logits
    seg_caches = [f for f in (folder / ".wfl_cache").iterdir()
                  if "_seg" in f.name]
    assert seg_caches, "chunked path did not run"
    lab2 = open(os.path.join(out2, "u.lab")).read()
    last_end = max((int(l.split()[1]) for l in lab2.splitlines() if l),
                   default=0)
    assert last_end > int(1.0 * 1e7)  # segments extend past the old 0.5 s


def test_negative_lang_id_raises(reference_tagger_module, tmp_path):
    """Negative lang_id must raise like the reference's torch embedding —
    JAX's traced gather would clamp it to language 0 and silently emit
    wrong labels (r3 review: only the upper bound was checked)."""
    ref_model, _, _ = reference_tagger_module
    labels, config, config_path, ckpt_path, _ = _setup_run(
        ref_model, tmp_path, "none", "neglang")
    rng = np.random.RandomState(2)
    wav = str(tmp_path / "neg.wav")
    write_wav(wav, rng.randn(8000) * 0.4, 16000)
    _our_session(config_path, ckpt_path, "none", labels)
    from wfl_asr_tpu.infer import infer_audio, infer_folder_batched
    with pytest.raises(ValueError, match="invalid"):
        infer_audio(wav, config_path, ckpt_path, lang_id=-2)
    folder = tmp_path / "negf"
    folder.mkdir()
    write_wav(str(folder / "a.wav"), rng.randn(8000) * 0.4, 16000)
    with pytest.raises(ValueError, match="invalid"):
        infer_folder_batched(str(folder), config_path, ckpt_path,
                             str(tmp_path / "nego"), lang_id=-2)


def test_empty_audio_zero_frames(reference_tagger_module, tmp_path):
    """A zero-length (or sub-receptive-field) input yields zero frames, not
    t_pad-1 frames of masked garbage (wavlm feature_lengths(0) == -1 used
    as a slice end kept everything but the last row)."""
    ref_model, _, _ = reference_tagger_module
    labels, config, config_path, ckpt_path, _ = _setup_run(
        ref_model, tmp_path, "none", "emptyaud")
    session = _our_session(config_path, ckpt_path, "none", labels)
    assert session.num_frames_for(0) == 0
    logits, offsets = session.forward(np.zeros(0, np.float32), [0])
    assert logits.shape[1] == 0 and offsets.shape[1] == 0

    # wavlm arithmetic: the raw recurrence goes negative below one
    # receptive field — num_frames_for is what clamps it
    from wfl_asr_tpu.models.wavlm import WavLMArch
    assert WavLMArch().feature_lengths(0) < 0


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


@pytest.mark.parametrize("lang_id,thr,median", [(0, 0.3, 3), (None, 0.5, 1)])
def test_device_decode_matches_host_decode(reference_tagger_module, tmp_path,
                                           lang_id, thr, median):
    """postprocess.device_decode: the fused on-device chain (lang averaging
    + gate + masked median + BIO state machine) must produce byte-identical
    .lab files AND identical .wfl_cache entries vs the host decode path."""
    import yaml
    ref_model, _, _ = reference_tagger_module
    labels, config, config_path, ckpt_path, _ = _setup_run(
        ref_model, tmp_path, "none", f"devdec{lang_id}{median}")

    rng = np.random.RandomState(13)
    folder_a = tmp_path / "hostdec"; folder_b = tmp_path / "devdec"
    folder_a.mkdir(); folder_b.mkdir()
    for i, dur in enumerate([0.6, 1.4, 0.9]):
        audio = (rng.randn(int(16000 * dur)) * 0.4)
        write_wav(str(folder_a / f"w{i}.wav"), audio, 16000)
        write_wav(str(folder_b / f"w{i}.wav"), audio, 16000)

    cfg = yaml.safe_load(open(config_path))
    cfg.setdefault("postprocess", {})["median_filter"] = median
    yaml.safe_dump(cfg, open(config_path, "w"))
    _our_session(config_path, ckpt_path, "none", labels)

    from wfl_asr_tpu.infer import infer_folder_batched
    out_a = str(tmp_path / "out_host")
    infer_folder_batched(str(folder_a), config_path, ckpt_path, out_a,
                         lang_id=lang_id, confidence_threshold=thr,
                         batch_files=3)

    # flip the flag on (the session caches Config per path — rewrite + a
    # fresh config file path so a new session picks it up)
    cfg["postprocess"]["device_decode"] = True
    dd_config = str(tmp_path / "config_devdec.yaml")
    yaml.safe_dump(cfg, open(dd_config, "w"))
    _our_session(dd_config, ckpt_path, "none", labels)
    out_b = str(tmp_path / "out_dev")
    infer_folder_batched(str(folder_b), dd_config, ckpt_path, out_b,
                         lang_id=lang_id, confidence_threshold=thr,
                         batch_files=3)

    for i in range(3):
        a = open(os.path.join(out_a, f"w{i}.lab")).read()
        b = open(os.path.join(out_b, f"w{i}.lab")).read()
        assert a == b, f"w{i}"

    # cache entries byte-agree too (same averaged logits/offsets contract)
    import torch
    suffix = f"_lang{lang_id}" if lang_id is not None else "_avg"
    for i in range(3):
        for kind in ("logits", "offsets"):
            pa = folder_a / ".wfl_cache" / f"w{i}{suffix}_{kind}.pt"
            pb = folder_b / ".wfl_cache" / f"w{i}{suffix}_{kind}.pt"
            ta = torch.load(str(pa), weights_only=True)
            tb = torch.load(str(pb), weights_only=True)
            assert torch.equal(ta, tb), (i, kind)


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

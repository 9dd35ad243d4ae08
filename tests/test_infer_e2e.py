"""End-to-end .lab parity: our inference pipeline vs the reference infer.py
run on the same checkpoint and audio (BASELINE.json north star)."""

import os
import sys

import numpy as np
import pytest
import torch
import yaml

import jax
import jax.numpy as jnp

from tests.test_encoders import small_wavlm_config, small_whisper_config
from tests.test_tagger import make_config, _our_arch, reference_tagger_module  # noqa: F401
from wfl_asr_tpu.data.audio import write_wav, read_wav


@pytest.fixture(scope="module", autouse=True)
def f32_matmuls():
    with jax.default_matmul_precision("highest"):
        yield


def _setup_run(ref_model, tmp_path, encoder_type, name):
    """Build save_dir artifacts + checkpoint + test wavs for one run."""
    labels = sorted([f"B-p{i}" for i in range(4)]
                    + [f"I-p{i}" for i in range(4)] + ["O", "B-SP", "I-SP"])
    save_dir = tmp_path / f"save_{name}"
    save_dir.mkdir()
    (save_dir / "phonemes.txt").write_text("\n".join(labels) + "\n")
    (save_dir / "langs.txt").write_text("en,0\nja,1\n")

    config = make_config(encoder_type)
    config["model"]["num_languages"] = 2
    config["output"]["save_dir"] = str(save_dir)
    config_path = save_dir / "config.yaml"
    config_path.write_text(yaml.dump(config, sort_keys=False))

    torch.manual_seed(11)
    ref = ref_model.BIOPhonemeTagger(config, labels).eval()
    ckpt_path = save_dir / "best_model.pt"
    torch.save(ref.state_dict(), str(ckpt_path))
    return labels, config, str(config_path), str(ckpt_path), ref


def _our_session(config_path, ckpt_path, encoder_type, labels):
    from wfl_asr_tpu.infer import pipeline as P
    whisper_cfg = small_whisper_config()
    wavlm_cfg = small_wavlm_config()
    import wfl_asr_tpu.config as C
    config = C.load_raw_config(config_path)
    arch = _our_arch(config, encoder_type, whisper_cfg, wavlm_cfg, len(labels))
    session = P.InferenceSession(config_path, ckpt_path, arch=arch)
    P._SESSION_CACHE[(os.path.abspath(config_path),
                      os.path.abspath(ckpt_path))] = session
    return session


@pytest.mark.parametrize("encoder_type", ["none", "wavlm", "whisper"])
@pytest.mark.parametrize("lang_id", [1, None])
def test_lab_parity_short(reference_tagger_module, tmp_path, encoder_type,
                          lang_id):
    """Whisper included: its inference decode covers all 1500 frames of the
    fixed 30 s pad (reference model.py:153-156, infer.py:251-302) — byte
    parity proves the 1500-frame quirk end to end, not just at unit level."""
    ref_model, _, _ = reference_tagger_module
    labels, config, config_path, ckpt_path, _ = _setup_run(
        ref_model, tmp_path, encoder_type, f"{encoder_type}_{lang_id}")

    rng = np.random.RandomState(5)
    audio = (rng.randn(int(16000 * 1.7)) * 0.4).astype(np.float64)

    ref_dir = tmp_path / f"refwav_{encoder_type}_{lang_id}"
    our_dir = tmp_path / f"ourwav_{encoder_type}_{lang_id}"
    ref_dir.mkdir(); our_dir.mkdir()
    write_wav(str(ref_dir / "u.wav"), audio, 16000)
    write_wav(str(our_dir / "u.wav"), audio, 16000)

    sys.modules["soundfile"].read = read_wav
    ref_infer = sys.modules["infer"]
    ref_out = str(ref_dir / "u.lab")
    ref_infer.infer_audio(str(ref_dir / "u.wav"), config_path, ckpt_path,
                          output_lab_path=ref_out, device="cpu",
                          lang_id=lang_id, confidence_threshold=0.5)

    _our_session(config_path, ckpt_path, encoder_type, labels)
    from wfl_asr_tpu.infer import infer_audio
    our_out = str(our_dir / "u.lab")
    infer_audio(str(our_dir / "u.wav"), config_path, ckpt_path,
                output_lab_path=our_out, device="cpu", lang_id=lang_id,
                confidence_threshold=0.5)

    assert open(our_out).read() == open(ref_out).read()


def test_lab_parity_chunked_and_forced(reference_tagger_module, tmp_path):
    """>30 s audio exercises the chunked path; a sibling .txt exercises
    forced alignment; second run exercises the logits cache."""
    ref_model, _, _ = reference_tagger_module
    encoder_type = "none"  # cheap on CPU at 65 s
    labels, config, config_path, ckpt_path, _ = _setup_run(
        ref_model, tmp_path, encoder_type, "chunked")

    rng = np.random.RandomState(6)
    audio = (rng.randn(int(16000 * 65.0)) * 0.4).astype(np.float64)

    ref_dir = tmp_path / "refwav_chunked"
    our_dir = tmp_path / "ourwav_chunked"
    ref_dir.mkdir(); our_dir.mkdir()
    for d in (ref_dir, our_dir):
        write_wav(str(d / "u.wav"), audio, 16000)
        (d / "u.txt").write_text("p0 p1 p2 p0\n")

    sys.modules["soundfile"].read = read_wav
    ref_infer = sys.modules["infer"]
    ref_infer.infer_audio(str(ref_dir / "u.wav"), config_path, ckpt_path,
                          output_lab_path=str(ref_dir / "u.lab"),
                          device="cpu", lang_id=0, confidence_threshold=0.3)

    _our_session(config_path, ckpt_path, encoder_type, labels)
    from wfl_asr_tpu.infer import infer_audio
    infer_audio(str(our_dir / "u.wav"), config_path, ckpt_path,
                output_lab_path=str(our_dir / "u.lab"), device="cpu",
                lang_id=0, confidence_threshold=0.3)
    assert open(our_dir / "u.lab").read() == open(ref_dir / "u.lab").read()

    # cache hit: re-run and confirm identical output from cached logits
    first = open(our_dir / "u.lab").read()
    infer_audio(str(our_dir / "u.wav"), config_path, ckpt_path,
                output_lab_path=str(our_dir / "u.lab"), device="cpu",
                lang_id=0, confidence_threshold=0.3)
    assert open(our_dir / "u.lab").read() == first
    assert (our_dir / ".wfl_cache").is_dir()


def test_lab_parity_whisper_chunked_forced(reference_tagger_module, tmp_path):
    """>30 s whisper audio: each chunk runs the fixed 30 s pad → 1500-frame
    decode (reference model.py:153-156, infer.py:98-184); forced alignment
    on top. Byte parity vs the actual reference infer.py."""
    ref_model, _, _ = reference_tagger_module
    encoder_type = "whisper"
    labels, config, config_path, ckpt_path, _ = _setup_run(
        ref_model, tmp_path, encoder_type, "whisper_chunked")

    rng = np.random.RandomState(9)
    audio = (rng.randn(int(16000 * 42.0)) * 0.4).astype(np.float64)

    ref_dir = tmp_path / "refwav_wchunk"
    our_dir = tmp_path / "ourwav_wchunk"
    ref_dir.mkdir(); our_dir.mkdir()
    for d in (ref_dir, our_dir):
        write_wav(str(d / "u.wav"), audio, 16000)
        (d / "u.txt").write_text("p0 p1 p2 p0\n")

    sys.modules["soundfile"].read = read_wav
    ref_infer = sys.modules["infer"]
    ref_infer.infer_audio(str(ref_dir / "u.wav"), config_path, ckpt_path,
                          output_lab_path=str(ref_dir / "u.lab"),
                          device="cpu", lang_id=None,
                          confidence_threshold=0.3)

    _our_session(config_path, ckpt_path, encoder_type, labels)
    from wfl_asr_tpu.infer import infer_audio
    infer_audio(str(our_dir / "u.wav"), config_path, ckpt_path,
                output_lab_path=str(our_dir / "u.lab"), device="cpu",
                lang_id=None, confidence_threshold=0.3)
    assert open(our_dir / "u.lab").read() == open(ref_dir / "u.lab").read()


def test_reference_reads_our_cache(reference_tagger_module, tmp_path):
    """Reverse interop: a .wfl_cache written by OUR pipeline must load in
    the reference's bare torch.load cache path (infer.py:246-249) and yield
    the same .lab (ADVICE r1: .npy-format entries crashed it)."""
    ref_model, _, _ = reference_tagger_module
    labels, config, config_path, ckpt_path, _ = _setup_run(
        ref_model, tmp_path, "none", "cacherev")

    rng = np.random.RandomState(12)
    audio = (rng.randn(16000) * 0.4).astype(np.float64)
    d = tmp_path / "cachewav_rev"
    d.mkdir()
    write_wav(str(d / "u.wav"), audio, 16000)

    _our_session(config_path, ckpt_path, "none", labels)
    from wfl_asr_tpu.infer import infer_audio
    infer_audio(str(d / "u.wav"), config_path, ckpt_path,
                output_lab_path=str(d / "our.lab"), device="cpu", lang_id=0,
                confidence_threshold=0.5)
    cache_files = sorted(os.listdir(d / ".wfl_cache"))
    assert cache_files  # our run populated the cache

    sys.modules["soundfile"].read = read_wav
    ref_infer = sys.modules["infer"]
    ref_infer.infer_audio(str(d / "u.wav"), config_path, ckpt_path,
                          output_lab_path=str(d / "ref.lab"), device="cpu",
                          lang_id=0, confidence_threshold=0.5)
    assert open(d / "ref.lab").read() == open(d / "our.lab").read()


def test_batched_folder_invalid_lang_raises(reference_tagger_module,
                                            tmp_path):
    """infer_folder_batched validates lang_id like _predict_segment does
    (ADVICE r1: it was silently clamped by the embedding gather)."""
    ref_model, _, _ = reference_tagger_module
    labels, config, config_path, ckpt_path, _ = _setup_run(
        ref_model, tmp_path, "none", "badlang")
    d = tmp_path / "badlangwav"
    d.mkdir()
    write_wav(str(d / "u.wav"),
              (np.random.RandomState(1).randn(8000) * 0.4), 16000)

    _our_session(config_path, ckpt_path, "none", labels)
    from wfl_asr_tpu.infer.pipeline import infer_folder_batched
    with pytest.raises(ValueError, match="Language ID"):
        infer_folder_batched(str(d), config_path, ckpt_path,
                             output_dir=str(tmp_path / "outbad"), lang_id=99)


def test_reads_reference_torch_cache(reference_tagger_module, tmp_path):
    """A .wfl_cache written by the reference (torch format) is reused by our
    pipeline."""
    ref_model, _, _ = reference_tagger_module
    labels, config, config_path, ckpt_path, _ = _setup_run(
        ref_model, tmp_path, "none", "cacheinterop")

    rng = np.random.RandomState(8)
    audio = (rng.randn(16000) * 0.4).astype(np.float64)
    d = tmp_path / "cachewav"
    d.mkdir()
    write_wav(str(d / "u.wav"), audio, 16000)

    sys.modules["soundfile"].read = read_wav
    ref_infer = sys.modules["infer"]
    ref_infer.infer_audio(str(d / "u.wav"), config_path, ckpt_path,
                          output_lab_path=str(d / "ref.lab"), device="cpu",
                          lang_id=0, confidence_threshold=0.5)
    assert (d / ".wfl_cache").is_dir()

    _our_session(config_path, ckpt_path, "none", labels)
    from wfl_asr_tpu.infer import infer_audio
    infer_audio(str(d / "u.wav"), config_path, ckpt_path,
                output_lab_path=str(d / "our.lab"), device="cpu", lang_id=0,
                confidence_threshold=0.5)
    assert open(d / "our.lab").read() == open(d / "ref.lab").read()

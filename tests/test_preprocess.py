"""Byte-parity of preprocess artifacts vs the reference driver
(reference preprocess.py:69-195)."""

import copy
import filecmp
import json
import os
import random

import numpy as np
import pytest

from wfl_asr_tpu.data.audio import write_wav, read_wav, wav_duration
from wfl_asr_tpu.labels import save_lab
from wfl_asr_tpu.preprocess import preprocess as our_preprocess

ARTIFACTS = ["dataset.json", "lang_phonemes.json", "phonemes.txt", "langs.txt",
             "config.yaml", "phoneme_merge_map.json"]


def make_fixture_dataset(root, rng, langs=("en", "ja"), files_per_lang=3):
    data_dir = os.path.join(root, "data")
    phs = {"en": ["ae", "k", "t", "SP"], "ja": ["a", "cl", "N", "SP"]}
    for lang in langs:
        os.makedirs(os.path.join(data_dir, lang), exist_ok=True)
        for i in range(files_per_lang):
            dur = rng.uniform(0.5, 2.0)
            n = int(dur * 16000)
            wav = np.sin(np.linspace(0, 100, n)) * 0.3
            write_wav(os.path.join(data_dir, lang, f"f{i}.wav"), wav, 16000)
            segs, t = [], 0.0
            while t < dur - 0.1:
                d = rng.uniform(0.05, 0.3)
                segs.append((t, min(t + d, dur), rng.choice(phs[lang])))
                t += d
            save_lab(os.path.join(data_dir, lang, f"f{i}.lab"), segs)
    return data_dir


def make_config(data_dir, save_dir, groups):
    return {
        "data": {"data_dir": data_dir, "sample_rate": 16000,
                 "num_val_files": 2, "max_seq_len": None,
                 "frame_duration": 0.02, "n_mels": 80},
        "model": {"encoder_type": "wavlm", "whisper_model": "openai/whisper-base",
                  "wavlm_model": "microsoft/wavlm-base-plus",
                  "num_languages": 0},
        "training": {"batch_size": 2, "merged_phoneme_groups": groups,
                     "max_steps": 10, "val_check_interval": 5,
                     "max_checkpoints": 2, "log_dir": save_dir,
                     "learning_rate": 1.0},
        "output": {"save_dir": save_dir},
        "postprocess": {"median_filter": 1, "merge_segments": "right",
                        "confidence_threshold": 0.5},
    }


def test_preprocess_artifact_parity(reference_oracle, tmp_path):
    import contextlib
    import io
    for groups in ([], [["A", "en/ae", "ja/a"], ["ja/cl", "en/t"]]):
        rng = random.Random(7)
        data_dir = make_fixture_dataset(str(tmp_path / f"d{len(groups)}"), rng)
        ours_dir = str(tmp_path / f"ours{len(groups)}")
        ref_dir = str(tmp_path / f"ref{len(groups)}")

        buf_ours = io.StringIO()
        with contextlib.redirect_stdout(buf_ours):
            our_preprocess(data_dir, make_config(data_dir, ours_dir, groups))

        import sys
        sys.modules["soundfile"].read = read_wav
        buf_ref = io.StringIO()
        with contextlib.redirect_stdout(buf_ref):
            reference_oracle.preprocess.preprocess(
                data_dir, make_config(data_dir, ref_dir, groups))

        # console parity (reference preprocess.py:168-195): identical lines
        # modulo the differing save_dir paths (tqdm goes to stderr)
        norm = lambda s, d: s.replace(d, "SAVE")  # noqa: E731
        assert norm(buf_ours.getvalue(), ours_dir) == \
            norm(buf_ref.getvalue(), ref_dir)

        for name in ARTIFACTS:
            p_ours, p_ref = os.path.join(ours_dir, name), os.path.join(ref_dir, name)
            assert os.path.exists(p_ours) == os.path.exists(p_ref), name
            if not os.path.exists(p_ref):
                continue
            if name == "config.yaml":
                import yaml
                ours = yaml.safe_load(open(p_ours))
                ref = yaml.safe_load(open(p_ref))
                ours["output"]["save_dir"] = ref["output"]["save_dir"] = "X"
                ours["training"]["log_dir"] = ref["training"]["log_dir"] = "X"
                assert ours == ref
            else:
                assert open(p_ours).read() == open(p_ref).read(), name


def test_incremental_inventory_extension(tmp_path):
    """Finetune-friendly incremental ids (reference preprocess.py:74-101)."""
    rng = random.Random(3)
    data_dir = make_fixture_dataset(str(tmp_path), rng, langs=("en",))
    save_dir = str(tmp_path / "save")
    os.makedirs(save_dir)
    with open(os.path.join(save_dir, "langs.txt"), "w") as f:
        f.write("zz,0\n")
    with open(os.path.join(save_dir, "phonemes.txt"), "w") as f:
        f.write("B-legacy\nI-legacy\nO\n")

    our_preprocess(data_dir, make_config(data_dir, save_dir, []))

    langs = dict(l.strip().split(",") for l in open(os.path.join(save_dir, "langs.txt")))
    assert langs == {"zz": "0", "en": "1"}
    tags = open(os.path.join(save_dir, "phonemes.txt")).read()
    assert "B-legacy" in tags and "B-ae" in tags

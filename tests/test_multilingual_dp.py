"""BASELINE config #5 shape: multilingual en/ja with merged phoneme groups,
end-to-end preprocess → DP train on the 8-device virtual mesh → infer."""

import os
import random as pyrandom

import numpy as np
import pytest


def test_multilingual_dp_train_and_infer(tmp_path):
    from tests.test_preprocess import make_fixture_dataset, make_config
    from wfl_asr_tpu.preprocess import preprocess as run_preprocess

    rng = pyrandom.Random(21)
    data_dir = make_fixture_dataset(str(tmp_path), rng, langs=("en", "ja"),
                                    files_per_lang=6)
    save_dir = str(tmp_path / "save")
    groups = [["A", "en/ae", "ja/a"], ["ja/cl", "en/t"]]
    config = make_config(data_dir, save_dir, groups)
    config["data"]["num_val_files"] = 2
    config["model"].update({
        "encoder_type": "none", "enable_bilstm": True, "bilstm_num_layer": 1,
        "num_conformer_layers": 1, "conformer_heads": 2,
        "conformer_ff_expansion": 2, "conformer_kernel_size": 31,
        "lang_emb_dim": 8,
    })
    config["training"].update({
        "batch_size": 8,  # divisible by the 8 virtual devices
        "optimizer": "Prodigy", "learning_rate": 1.0,
        "label_smoothing": 0.1, "max_steps": 2, "val_check_interval": 2,
        "max_checkpoints": 2, "seed": 0,
    })
    run_preprocess(data_dir, config)

    # merged canonical phonemes present in the artifacts
    import json
    merge_map = json.load(open(os.path.join(save_dir,
                                            "phoneme_merge_map.json")))
    assert "A" in merge_map and merge_map["A"] == {"en": "ae", "ja": "a"}

    from wfl_asr_tpu.train.loop import train
    train(os.path.join(save_dir, "config.yaml"))
    assert os.path.exists(os.path.join(save_dir, "best_model.pt"))

    # infer one wav per language with per-language mapping, plus averaged
    from wfl_asr_tpu.infer import infer_audio
    wav = os.path.join(data_dir, "ja", "f0.wav")
    out = str(tmp_path / "ja.lab")
    segs = infer_audio(wav, os.path.join(save_dir, "config.yaml"),
                       os.path.join(save_dir, "best_model.pt"),
                       output_lab_path=out, lang_id=1,
                       confidence_threshold=0.0)
    assert os.path.exists(out)
    # canonical→lang mapping applied: "A" must appear as "a" for ja.
    # The absence check alone is vacuous if the 2-step model never emits
    # an A-tagged segment, so pin the mapping positively as well.
    phs = {ph for _, _, ph in segs}
    assert "A" not in phs
    from wfl_asr_tpu.labels import canonical_to_lang
    assert canonical_to_lang("A", "ja", merge_map) == "a"
    assert canonical_to_lang("A", "en", merge_map) == "ae"

    segs_avg = infer_audio(wav, os.path.join(save_dir, "config.yaml"),
                           os.path.join(save_dir, "best_model.pt"),
                           output_lab_path=str(tmp_path / "avg.lab"),
                           lang_id=None, confidence_threshold=0.0)
    assert isinstance(segs_avg, list)

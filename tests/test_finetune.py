"""Finetune surgery: lang-embedding expansion + classifier row transfer by
matching tag names (reference train.py:334-377 semantics)."""

import os

import numpy as np
import jax

from wfl_asr_tpu.checkpoint import save_model_checkpoint
from wfl_asr_tpu.config import Config
from wfl_asr_tpu.models.tagger import TaggerArch, init_tagger
from wfl_asr_tpu.train.loop import finetune_surgery


def _arch(num_labels, num_languages):
    return TaggerArch(encoder_type="none", num_labels=num_labels,
                      num_languages=num_languages, hidden_size=80,
                      lang_emb_dim=8, enable_bilstm=False,
                      num_conformer_layers=1, conformer_heads=2,
                      conformer_ff_expansion=2, conformer_kernel=31,
                      enable_dilated_conv=False)


def test_finetune_surgery_transfers(tmp_path):
    old_labels = ["B-a", "B-b", "I-a", "I-b", "O"]
    new_labels = ["B-a", "B-c", "I-a", "I-c", "O"]

    base_arch = _arch(len(old_labels), 1)
    base_params, base_state = init_tagger(jax.random.PRNGKey(0), base_arch)
    base_dir = tmp_path / "base"
    base_dir.mkdir()
    ckpt = str(base_dir / "best_model.pt")
    save_model_checkpoint(ckpt, base_params, base_state, base_arch)
    (base_dir / "phonemes.txt").write_text("\n".join(old_labels) + "\n")

    new_arch = _arch(len(new_labels), 3)
    new_params, new_state = init_tagger(jax.random.PRNGKey(1), new_arch)
    fresh_classifier = np.asarray(new_params["classifier"]["w"]).copy()

    cfg = Config({"finetuning": {"enable": True, "model_path": ckpt},
                  "model": {"num_languages": 3}})
    out_params, _ = finetune_surgery(new_params, new_state, new_arch, cfg,
                                     new_labels, jax.random.PRNGKey(2))

    # lang embedding: first row preserved, grown to 3 rows
    emb = np.asarray(out_params["lang"]["emb"]["w"])
    assert emb.shape[0] == 3
    np.testing.assert_allclose(
        emb[0], np.asarray(base_params["lang"]["emb"]["w"])[0])

    # classifier: matching tags (B-a, I-a, O) copied from base; new tags
    # (B-c, I-c) keep the fresh init
    w = np.asarray(out_params["classifier"]["w"])
    base_w = np.asarray(base_params["classifier"]["w"])
    np.testing.assert_allclose(w[:, 0], base_w[:, 0])   # B-a
    np.testing.assert_allclose(w[:, 2], base_w[:, 2])   # I-a
    np.testing.assert_allclose(w[:, 4], base_w[:, 4])   # O
    np.testing.assert_allclose(w[:, 1], fresh_classifier[:, 1])  # B-c fresh
    # everything else (conformer etc.) comes from the base checkpoint
    np.testing.assert_allclose(
        np.asarray(out_params["conformer"][0]["ln1"]["scale"]),
        np.asarray(base_params["conformer"][0]["ln1"]["scale"]))


def test_finetune_surgery_missing_phonemes_raises(tmp_path):
    base_arch = _arch(3, 1)
    p, s = init_tagger(jax.random.PRNGKey(0), base_arch)
    ckpt = str(tmp_path / "best_model.pt")
    save_model_checkpoint(ckpt, p, s, base_arch)
    cfg = Config({"finetuning": {"enable": True, "model_path": ckpt},
                  "model": {"num_languages": 1}})
    import pytest
    with pytest.raises(RuntimeError, match="phoneme list"):
        finetune_surgery(p, s, base_arch, cfg, ["B-a", "I-a", "O"],
                         jax.random.PRNGKey(1))

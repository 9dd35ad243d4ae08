"""Checkpoint backends: .pt interop roundtrip, orbax roundtrip, resume
discovery, and train-state sidecars."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from wfl_asr_tpu.checkpoint import (find_resume_checkpoint,
                                    load_model_checkpoint,
                                    load_train_state,
                                    save_model_checkpoint, save_train_state)
from wfl_asr_tpu.models.tagger import TaggerArch, init_tagger


def small_arch():
    return TaggerArch(encoder_type="none", num_labels=5, num_languages=2,
                      hidden_size=80, lang_emb_dim=8, enable_bilstm=True,
                      bilstm_num_layers=1, num_conformer_layers=1,
                      conformer_heads=2, conformer_ff_expansion=2,
                      conformer_kernel=31, enable_dilated_conv=True,
                      dilated_depth=1, dilated_kernel=3)


def assert_trees_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)


@pytest.mark.parametrize("fmt", ["pt", "orbax"])
def test_model_roundtrip(tmp_path, fmt):
    arch = small_arch()
    params, state = init_tagger(jax.random.PRNGKey(0), arch)
    path = str(tmp_path / "model_step10.pt")
    save_model_checkpoint(path, params, state, arch, fmt=fmt)
    restored_params, restored_state = load_model_checkpoint(path, arch)
    assert_trees_equal(params, restored_params)
    assert_trees_equal(state, restored_state)


def test_find_resume(tmp_path):
    arch = small_arch()
    params, state = init_tagger(jax.random.PRNGKey(0), arch)
    for step in (5, 20, 10):
        save_model_checkpoint(str(tmp_path / f"model_step{step}.pt"),
                              params, state, arch)
    found = find_resume_checkpoint(str(tmp_path))
    assert found is not None
    path, step = found
    assert step == 20 and path.endswith("model_step20.pt")
    empty = tmp_path / "empty"
    empty.mkdir()
    assert find_resume_checkpoint(str(empty)) is None


def test_find_resume_orbax_and_rotation(tmp_path):
    """Orbax-format checkpoints must be discovered on resume and removed on
    rotation (ADVICE r1: the old regex never matched .pt.orbax dirs, so
    orbax runs silently restarted from scratch and dirs accumulated)."""
    from wfl_asr_tpu.checkpoint import remove_checkpoint

    arch = small_arch()
    params, state = init_tagger(jax.random.PRNGKey(0), arch)
    for step in (5, 20, 10):
        save_model_checkpoint(str(tmp_path / f"model_step{step}.pt"),
                              params, state, arch, fmt="orbax")
    found = find_resume_checkpoint(str(tmp_path))
    assert found is not None
    path, step = found
    assert step == 20 and path.endswith("model_step20.pt")
    # the returned .pt-rooted path loads the orbax payload
    restored_params, _ = load_model_checkpoint(path, arch)
    assert_trees_equal(params, restored_params)

    remove_checkpoint(str(tmp_path / "model_step5.pt"))
    assert not os.path.exists(str(tmp_path / "model_step5.pt.orbax"))
    found = find_resume_checkpoint(str(tmp_path))
    assert found is not None and found[1] == 20


def test_remove_checkpoint_all_formats(tmp_path):
    arch = small_arch()
    params, state = init_tagger(jax.random.PRNGKey(0), arch)
    from wfl_asr_tpu.checkpoint import remove_checkpoint
    path = str(tmp_path / "model_step3.pt")
    save_model_checkpoint(path, params, state, arch, fmt="pt")
    save_train_state(path, {"m": np.zeros(2)}, 3,
                     np.asarray(jax.random.PRNGKey(0)))
    assert os.path.exists(path)
    remove_checkpoint(path)
    assert not os.path.exists(path)
    assert not os.path.exists(str(tmp_path / "model_step3.train.npz"))


def test_atomic_save_no_tmp_left(tmp_path):
    """Saves go through tmp + os.replace: no .tmp residue, and the final
    file only ever appears complete (crash-mid-save cannot leave a torn
    .pt that poisons auto-resume)."""
    arch = small_arch()
    params, state = init_tagger(jax.random.PRNGKey(0), arch)
    path = str(tmp_path / "model_step1.pt")
    save_model_checkpoint(path, params, state, arch)
    save_train_state(path, {"m": np.zeros(2)}, 1,
                     np.asarray(jax.random.PRNGKey(0)))
    assert os.path.exists(path)
    assert not any(f.endswith(".tmp") for f in os.listdir(tmp_path))


def test_resume_falls_back_past_corrupt_checkpoint(tmp_path):
    """A truncated newest checkpoint (e.g. a kill mid-save from before
    atomic writes) must not poison resume: find_resume_checkpoints lists
    newest-first so the driver can fall back to the previous good one."""
    from wfl_asr_tpu.checkpoint import find_resume_checkpoints

    arch = small_arch()
    params, state = init_tagger(jax.random.PRNGKey(0), arch)
    good = str(tmp_path / "model_step10.pt")
    save_model_checkpoint(good, params, state, arch)
    # fake a torn newer checkpoint
    bad = str(tmp_path / "model_step20.pt")
    with open(bad, "wb") as f:
        f.write(b"\x00" * 1024)

    ckpts = find_resume_checkpoints(str(tmp_path))
    assert [s for _, s in ckpts] == [20, 10]

    loaded = None
    for path, step in ckpts:
        try:
            loaded = (load_model_checkpoint(path, arch), step)
            break
        except Exception:
            continue
    assert loaded is not None and loaded[1] == 10
    assert_trees_equal(params, loaded[0][0])


def test_train_state_sidecar(tmp_path):
    arch = small_arch()
    params, _ = init_tagger(jax.random.PRNGKey(0), arch)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    # advance one step so moments are non-trivial
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    _, opt_state = tx.update(grads, opt_state, params)

    model_path = str(tmp_path / "model_step7.pt")
    rng = np.asarray(jax.random.PRNGKey(3))
    save_train_state(model_path, opt_state, 7, rng,
                     scheduler_state={"last_epoch": 7, "factor": 0.5})

    template = tx.init(params)
    restored = load_train_state(model_path, template)
    assert restored is not None
    r_opt, r_step, r_rng, r_sched = restored
    assert r_step == 7
    np.testing.assert_array_equal(r_rng, rng)
    assert_trees_equal(r_opt, opt_state)
    assert r_sched == {"last_epoch": 7.0, "factor": 0.5}

    assert load_train_state(str(tmp_path / "model_step9.pt"), template) is None


# ---------------------------------------------------------------------------
# Encoder export (round 3: export_tagger previously DROPPED wavlm/whisper
# encoder weights — trainer-saved checkpoints for those encoders were
# unloadable)
# ---------------------------------------------------------------------------

def _wavlm_arch():
    from wfl_asr_tpu.models.wavlm import WavLMArch
    wavlm = WavLMArch(hidden_size=64, num_layers=2, num_heads=4,
                      intermediate_size=128, conv_dim=(32, 32, 32),
                      conv_kernel=(10, 3, 3), conv_stride=(5, 2, 2),
                      num_conv_pos_embeddings=16,
                      num_conv_pos_embedding_groups=4,
                      num_buckets=40, max_distance=100)
    return TaggerArch(encoder_type="wavlm", num_labels=5, num_languages=2,
                      hidden_size=64, lang_emb_dim=8, enable_bilstm=False,
                      num_conformer_layers=1, conformer_heads=2,
                      conformer_ff_expansion=2, conformer_kernel=31,
                      enable_dilated_conv=False, wavlm=wavlm)


def _whisper_arch():
    from wfl_asr_tpu.models.whisper import WhisperArch
    whisper = WhisperArch(d_model=64, num_layers=2, num_heads=4,
                          ffn_dim=128, num_mel_bins=80)
    return TaggerArch(encoder_type="whisper", num_labels=5, num_languages=2,
                      hidden_size=64, lang_emb_dim=8, enable_bilstm=True,
                      bilstm_num_layers=1, num_conformer_layers=1,
                      conformer_heads=2, conformer_ff_expansion=2,
                      conformer_kernel=31, enable_dilated_conv=True,
                      dilated_depth=1, dilated_kernel=3, whisper=whisper)


@pytest.mark.parametrize("mk", [_wavlm_arch, _whisper_arch])
def test_encoder_roundtrip(tmp_path, mk):
    arch = mk()
    params, state = init_tagger(jax.random.PRNGKey(1), arch)
    path = str(tmp_path / "model_step5.pt")
    save_model_checkpoint(path, params, state, arch)
    p2, s2 = load_model_checkpoint(path, arch)
    assert "encoder" in p2
    assert_trees_equal(params, p2)
    assert_trees_equal(state, s2)


def test_export_wavlm_strict_loads_into_hf():
    """export_wavlm's keys must be EXACTLY an HF WavLMModel state_dict
    (strict load) and reproduce the same outputs — checkpoint interop with
    the reference, which holds the HF module as self.encoder
    (model.py:80)."""
    import torch
    from transformers.models.wavlm.configuration_wavlm import WavLMConfig
    from transformers import WavLMModel
    from wfl_asr_tpu.models.convert import export_wavlm
    from wfl_asr_tpu.models.wavlm import init_wavlm, wavlm_encode

    arch = _wavlm_arch().wavlm
    params = init_wavlm(jax.random.PRNGKey(2), arch)
    sd = {k: torch.tensor(v) for k, v in export_wavlm(params, arch).items()}

    hf_cfg = WavLMConfig(
        hidden_size=arch.hidden_size, num_hidden_layers=arch.num_layers,
        num_attention_heads=arch.num_heads,
        intermediate_size=arch.intermediate_size,
        conv_dim=list(arch.conv_dim), conv_kernel=list(arch.conv_kernel),
        conv_stride=list(arch.conv_stride), conv_bias=arch.conv_bias,
        feat_extract_norm=arch.feat_extract_norm,
        num_conv_pos_embeddings=arch.num_conv_pos_embeddings,
        num_conv_pos_embedding_groups=arch.num_conv_pos_embedding_groups,
        num_buckets=arch.num_buckets, max_bucket_distance=arch.max_distance,
        do_stable_layer_norm=arch.do_stable_layer_norm,
        apply_spec_augment=False, mask_time_prob=0.0, mask_feature_prob=0.0,
        layerdrop=0.0, hidden_dropout=0.0, activation_dropout=0.0,
        attention_dropout=0.0, feat_proj_dropout=0.0)
    model = WavLMModel(hf_cfg).eval()
    model.load_state_dict(sd, strict=True)

    rng = np.random.RandomState(1)
    audio = rng.randn(2, 3200).astype(np.float32) * 0.5
    import torch as _torch
    with _torch.no_grad():
        ref = model(_torch.tensor(audio)).last_hidden_state.numpy()
    with jax.default_matmul_precision("highest"):
        ours = np.asarray(wavlm_encode(params, arch, jnp.asarray(audio)))
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


def test_export_whisper_strict_loads_into_hf():
    import torch
    from transformers import WhisperConfig, WhisperModel
    from wfl_asr_tpu.models.convert import export_whisper_encoder
    from wfl_asr_tpu.models.whisper import (init_whisper_encoder,
                                            whisper_encode)

    arch = _whisper_arch().whisper
    params = init_whisper_encoder(jax.random.PRNGKey(3), arch)
    sd = {k: torch.tensor(v)
          for k, v in export_whisper_encoder(params).items()}

    hf_cfg = WhisperConfig(
        d_model=arch.d_model, encoder_layers=arch.num_layers,
        encoder_attention_heads=arch.num_heads, encoder_ffn_dim=arch.ffn_dim,
        num_mel_bins=arch.num_mel_bins, max_source_positions=1500,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        decoder_layers=1, decoder_attention_heads=2, decoder_ffn_dim=64)
    enc = WhisperModel(hf_cfg).eval().encoder
    enc.load_state_dict(sd, strict=True)

    feats = np.random.RandomState(2).randn(1, 80, 3000).astype(np.float32)
    with torch.no_grad():
        ref = enc(torch.tensor(feats)).last_hidden_state.numpy()
    with jax.default_matmul_precision("highest"):
        ours = np.asarray(whisper_encode(params, arch, jnp.asarray(feats)))
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)

"""Sequence parallelism (parallel/sp.py): Megatron-SP activation sharding
over the 'model' mesh axis, on the virtual 8-device CPU platform.

The reference is single-device; SP is a TPU-native extension (scaling-book
recipe: constrain shardings, GSPMD inserts the collectives). These tests
pin that (a) the constraint actually shards the time axis, (b) forward /
train numerics are unchanged under TP+SP, and (c) the flag is inert
without a >1 'model' axis.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from wfl_asr_tpu.parallel import (batch_sharding, make_mesh, replicate,
                                  shard_params_tp, shard_time, sp_active)


def _tiny_arch():
    import __graft_entry__ as graft
    return graft._flagship_arch(tiny=True)


def test_sp_active_gating():
    mesh_dp = make_mesh()                      # model=1
    mesh_tp = make_mesh(model_parallel=2)
    assert not sp_active(None, True)
    assert not sp_active(mesh_dp, True)
    assert not sp_active(mesh_tp, False)
    assert sp_active(mesh_tp, True)


def test_shard_time_places_t_on_model():
    mesh = make_mesh(model_parallel=2)
    x = jnp.zeros((4, 64, 16), jnp.float32)
    y = jax.jit(lambda a: shard_time(a, mesh))(x)
    spec = y.sharding.spec
    assert tuple(spec)[:2] == ("data", "model")


def test_sp_forward_matches_unsharded_wavlm():
    """TP(2) + SP forward on the (4,2) mesh == single-device forward.
    T=4000 samples → 12 frames on the tiny conv stack; uneven T over the
    2-way model axis exercises GSPMD's padding path too."""
    from wfl_asr_tpu.models.tagger import apply_tagger, init_tagger

    arch = _tiny_arch()
    params, state = init_tagger(jax.random.PRNGKey(0), arch)
    rng = np.random.RandomState(0)
    audio = jnp.asarray((rng.randn(8, 4000) * 0.3).astype(np.float32))
    lang_ids = jnp.asarray(rng.randint(0, 2, 8).astype(np.int32))

    def fwd(mesh_, sp_):
        @jax.jit
        def f(p, st, a, l):
            logits, offsets, _ = apply_tagger(p, st, arch, a, l, mesh=mesh_,
                                              sequence_parallel=sp_)
            return logits, offsets
        return f

    ref_logits, ref_offsets = fwd(None, False)(params, state, audio,
                                               lang_ids)

    mesh = make_mesh(model_parallel=2)
    p_tp = shard_params_tp(params, mesh)
    s_r = replicate(state, mesh)
    a_sh = jax.device_put(audio, batch_sharding(mesh, 2))
    l_sh = jax.device_put(lang_ids, batch_sharding(mesh, 1))
    sp_logits, sp_offsets = fwd(mesh, True)(p_tp, s_r, a_sh, l_sh)

    np.testing.assert_allclose(np.asarray(sp_logits),
                               np.asarray(ref_logits),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(sp_offsets),
                               np.asarray(ref_offsets),
                               rtol=2e-4, atol=2e-4)


def test_sp_forward_matches_unsharded_whisper():
    from wfl_asr_tpu.models.whisper import (WhisperArch,
                                            init_whisper_encoder,
                                            whisper_encode)

    arch = WhisperArch(num_mel_bins=8, d_model=16, num_layers=2,
                       num_heads=2, ffn_dim=32, max_source_positions=50)
    params = init_whisper_encoder(jax.random.PRNGKey(0), arch)
    rng = np.random.RandomState(1)
    feats = jnp.asarray(rng.randn(8, 8, 100).astype(np.float32))

    ref = jax.jit(lambda p, f: whisper_encode(p, arch, f))(params, feats)

    mesh = make_mesh(model_parallel=2)
    p_r = replicate(params, mesh)
    f_sh = jax.device_put(feats, batch_sharding(mesh, 3))
    out = jax.jit(lambda p, f: whisper_encode(
        p, arch, f, mesh=mesh, sequence_parallel=True))(p_r, f_sh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_sp_train_step_matches_tp_only():
    """One Prodigy train step under TP(2)+SP == TP(2) alone: the constraint
    must not change loss/gradient numerics (it only relocates shards)."""
    import optax
    from wfl_asr_tpu.models.tagger import init_tagger
    from wfl_asr_tpu.train.loop import make_train_step
    from wfl_asr_tpu.train.prodigy import prodigy

    arch = _tiny_arch()
    params, model_state = init_tagger(jax.random.PRNGKey(0), arch)

    def build(learning_rate):
        return prodigy(learning_rate=learning_rate)

    tx = optax.inject_hyperparams(build)(learning_rate=1.0)

    rng = np.random.RandomState(2)
    b, s, t = 8, 4000, 12
    host = {
        "audio": (rng.randn(b, s) * 0.1).astype(np.float32),
        "labels": rng.randint(0, arch.num_labels,
                              size=(b, t)).astype(np.int64),
        "lang_ids": rng.randint(0, 2, size=b).astype(np.int32),
        "off_frames": rng.randint(0, t, size=(b, 8)).astype(np.int32),
        "off_channels": rng.randint(0, 2, size=(b, 8)).astype(np.int32),
        "off_fracs": rng.rand(b, 8).astype(np.float32),
        "off_valid": np.ones((b, 8), bool),
    }
    step_rng = jax.random.PRNGKey(1)

    def run(sp_):
        mesh = make_mesh(model_parallel=2)
        # fresh host copies per run: the train step donates its buffers,
        # and device_put may alias an already-placed array
        host_copy = lambda tree: jax.tree_util.tree_map(
            lambda x: np.array(x), tree)
        p = shard_params_tp(host_copy(params), mesh)
        ms = replicate(host_copy(model_state), mesh)
        from wfl_asr_tpu.parallel import tp_shardings
        opt0 = tx.init(host_copy(params))
        os_ = jax.tree_util.tree_map(jax.device_put, opt0,
                                     tp_shardings(opt0, mesh))
        arrays = {k: jax.device_put(jnp.asarray(v),
                                    batch_sharding(mesh, np.ndim(v)))
                  for k, v in host.items()}
        step = make_train_step(arch, 0.1, 3.0, tx, mesh=mesh,
                               sequence_parallel=sp_)
        out = step(p, ms, os_, step_rng,
                   arrays["audio"], arrays["labels"], arrays["lang_ids"],
                   arrays["off_frames"], arrays["off_channels"],
                   arrays["off_fracs"], arrays["off_valid"],
                   max_label_len=t)
        _, _, _, metrics, pred_ids, _ = out
        return ({k: float(v) for k, v in metrics.items()},
                np.asarray(pred_ids))

    m_tp, ids_tp = run(False)
    m_sp, ids_sp = run(True)
    for k in m_tp:
        np.testing.assert_allclose(m_sp[k], m_tp[k], rtol=1e-5,
                                   err_msg=k)
    # argmax ids can only differ at exact logit ties; require equality
    np.testing.assert_array_equal(ids_sp, ids_tp)


def test_sp_session_flag(tmp_path):
    """model.sequence_parallel on an encoderless session: inert without a
    model>1 mesh (warning path), numerics unchanged with one."""
    import yaml

    from wfl_asr_tpu.checkpoint import save_model_checkpoint
    from wfl_asr_tpu.infer.pipeline import InferenceSession
    from wfl_asr_tpu.models.tagger import TaggerArch, init_tagger

    labels = [f"B-p{i}" for i in range(3)] + \
             [f"I-p{i}" for i in range(3)] + ["O"]
    save_dir = tmp_path / "save"
    save_dir.mkdir()
    (save_dir / "phonemes.txt").write_text("\n".join(sorted(labels)) + "\n")
    (save_dir / "langs.txt").write_text("en,0\nja,1\n")
    cfg = {"data": {"sample_rate": 16000, "frame_duration": 0.02,
                    "n_mels": 40},
           "model": {"encoder_type": "none", "num_languages": 2,
                     "lang_emb_dim": 8, "sequence_parallel": True},
           "output": {"save_dir": str(save_dir)},
           "postprocess": {"median_filter": 1, "merge_segments": "none"}}
    config_path = save_dir / "config.yaml"
    config_path.write_text(yaml.dump(cfg))

    arch = TaggerArch(encoder_type="none", num_labels=len(labels),
                      num_languages=2, hidden_size=40, lang_emb_dim=8,
                      enable_bilstm=True, bilstm_num_layers=1,
                      num_conformer_layers=1, conformer_heads=2,
                      conformer_ff_expansion=2, conformer_kernel=31,
                      enable_dilated_conv=False, n_mels=40)
    params, state = init_tagger(jax.random.PRNGKey(0), arch)
    ckpt = str(save_dir / "best_model.pt")
    save_model_checkpoint(ckpt, params, state, arch)

    rng = np.random.RandomState(3)
    audio = (rng.randn(16000) * 0.3).astype(np.float32)

    plain = InferenceSession(str(config_path), ckpt, arch=arch)
    assert not plain.sequence_parallel  # no mesh → flag inert
    seg_ref = plain.forward(audio, lang_ids=[0])

    sp = InferenceSession(str(config_path), ckpt, arch=arch,
                          mesh=make_mesh(model_parallel=2))
    assert sp.sequence_parallel
    seg_sp = sp.forward(audio, lang_ids=[0])
    np.testing.assert_allclose(np.asarray(seg_sp[0], np.float32),
                               np.asarray(seg_ref[0], np.float32),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(seg_sp[1], np.float32),
                               np.asarray(seg_ref[1], np.float32),
                               rtol=2e-4, atol=2e-4)

"""Pipeline parallelism (parallel/pp.py): GPipe schedule over a
('data','stage') mesh on the virtual 8-device CPU platform.

No reference analogue (single-device torch); pins that the pipelined
transformer stack is numerically identical to the sequential layer loop —
at the raw gpipe_apply level, through the full WavLM encoder (incl. the
shared position bias and per-row frame masks), and composed with data
parallelism on the leading mesh axis.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wfl_asr_tpu.parallel import pp


def _stacked_mlp(rng, n_layers, width):
    ws = rng.randn(n_layers, width, width).astype(np.float32) * 0.3
    bs = rng.randn(n_layers, width).astype(np.float32) * 0.1
    return {"w": jnp.asarray(ws), "b": jnp.asarray(bs)}


def _mlp_layer(lp, h, rows, shr):
    del rows, shr
    return jnp.tanh(h @ lp["w"] + lp["b"])


def _seq_apply(stacked, x):
    n = stacked["w"].shape[0]
    for i in range(n):
        lp = {"w": stacked["w"][i], "b": stacked["b"][i]}
        x = _mlp_layer(lp, x, (), ())
    return x


def test_gpipe_matches_sequential_various_schedules():
    rng = np.random.RandomState(0)
    stacked = _stacked_mlp(rng, 8, 16)
    x = jnp.asarray(rng.randn(16, 10, 16).astype(np.float32))
    ref = _seq_apply(stacked, x)

    # make_pp_mesh(S) → (data=8/S, stage=S); microbatch rows must divide
    # the data axis: (S, M) with 16/M % (8/S) == 0.
    for stages, micro in ((2, 4), (4, 4), (4, 8), (8, 2), (8, 16)):
        mesh = pp.make_pp_mesh(stages)
        placed = pp.place_stacked(stacked, mesh)
        out = jax.jit(lambda s, a: pp.gpipe_apply(
            _mlp_layer, s, a, mesh, microbatches=micro))(placed, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6,
                                   err_msg=f"S={stages} M={micro}")


def test_gpipe_with_data_parallel_axis():
    """(data=2, stage=4) mesh: microbatch rows shard over 'data' while the
    layers pipeline over 'stage'."""
    rng = np.random.RandomState(1)
    stacked = _stacked_mlp(rng, 4, 8)
    x = jnp.asarray(rng.randn(8, 6, 8).astype(np.float32))
    ref = _seq_apply(stacked, x)

    mesh = pp.make_pp_mesh(4)                       # data=2, stage=4
    assert dict(mesh.shape) == {"data": 2, "stage": 4}
    placed = pp.place_stacked(stacked, mesh)
    out = jax.jit(lambda s, a: pp.gpipe_apply(
        _mlp_layer, s, a, mesh, microbatches=4))(placed, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_gpipe_per_row_and_shared_operands():
    """per_row slices [B,...] operands per microbatch; shared operands are
    identical for all ticks."""
    rng = np.random.RandomState(2)
    stacked = _stacked_mlp(rng, 4, 8)
    x = jnp.asarray(rng.randn(8, 6, 8).astype(np.float32))
    row_mask = jnp.asarray((rng.rand(8, 6) > 0.3).astype(np.float32))
    scale = jnp.asarray(1.0 + rng.rand(8).astype(np.float32))

    def layer(lp, h, rows, shr):
        (m,) = rows
        (sc,) = shr
        return jnp.tanh(h @ lp["w"] + lp["b"]) * m[:, :, None] * sc

    def seq(xx):
        for i in range(stacked["w"].shape[0]):
            lp = {"w": stacked["w"][i], "b": stacked["b"][i]}
            xx = layer(lp, xx, (row_mask,), (scale,))
        return xx

    ref = seq(x)
    mesh = pp.make_pp_mesh(4)
    placed = pp.place_stacked(stacked, mesh)
    out = jax.jit(lambda s, a, m_, sc_: pp.gpipe_apply(
        layer, s, a, mesh, microbatches=4,
        per_row=(m_,), shared=(sc_,)))(placed, x, row_mask, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_stack_unstack_roundtrip_and_validation():
    rng = np.random.RandomState(3)
    layers = [{"w": jnp.asarray(rng.randn(4, 4).astype(np.float32))}
              for _ in range(6)]
    stacked = pp.stack_layers(layers)
    assert stacked["w"].shape == (6, 4, 4)
    back = pp.unstack_layers(stacked)
    for a, b in zip(back, layers):
        np.testing.assert_array_equal(np.asarray(a["w"]),
                                      np.asarray(b["w"]))
    with pytest.raises(ValueError):
        pp.make_pp_mesh(1)
    with pytest.raises(ValueError):
        pp.make_pp_mesh(3)          # 8 % 3 != 0
    mesh = pp.make_pp_mesh(4)
    with pytest.raises(ValueError):
        pp.place_stacked(stacked, mesh)   # 6 layers % 4 stages


def test_wavlm_encoder_pipelined_matches_sequential():
    """Full WavLM encoder with stacked layers over (data=2, stage=4) ==
    the sequential loop, with and without frame masks."""
    import __graft_entry__ as graft
    from wfl_asr_tpu.models.wavlm import init_wavlm, wavlm_encode

    arch = graft._flagship_arch(tiny=True).wavlm
    # tiny arch has 2 layers; deepen to 4 so every stage holds one layer
    import dataclasses
    arch = dataclasses.replace(arch, num_layers=4)
    params = init_wavlm(jax.random.PRNGKey(0), arch)

    rng = np.random.RandomState(4)
    audio = jnp.asarray((rng.randn(8, 4000) * 0.3).astype(np.float32))
    t = arch.feature_lengths(4000)
    mask = jnp.asarray(
        (np.arange(t)[None, :] < rng.randint(t // 2, t + 1, size=(8, 1)))
        .astype(np.float32))

    ref = jax.jit(lambda p, a: wavlm_encode(p, arch, a))(params, audio)
    ref_m = jax.jit(lambda p, a, m: wavlm_encode(p, arch, a, mask=m))(
        params, audio, mask)

    mesh = pp.make_pp_mesh(4)
    pp_params = dict(params)
    pp_params["layers"] = pp.place_stacked(
        pp.stack_layers(params["layers"]), mesh)

    out = jax.jit(lambda p, a: wavlm_encode(p, arch, a, mesh=mesh))(
        pp_params, audio)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    out_m = jax.jit(lambda p, a, m: wavlm_encode(
        p, arch, a, mask=m, mesh=mesh, pp_microbatches=2))(
        pp_params, audio, mask)
    np.testing.assert_allclose(np.asarray(out_m), np.asarray(ref_m),
                               rtol=1e-5, atol=1e-5)


def test_wavlm_pipelined_rejects_bad_usage():
    import __graft_entry__ as graft
    import dataclasses
    from wfl_asr_tpu.models.wavlm import init_wavlm, wavlm_encode

    arch = dataclasses.replace(graft._flagship_arch(tiny=True).wavlm,
                               num_layers=4)
    params = init_wavlm(jax.random.PRNGKey(0), arch)
    mesh = pp.make_pp_mesh(4)
    pp_params = dict(params)
    pp_params["layers"] = pp.place_stacked(
        pp.stack_layers(params["layers"]), mesh)
    audio = jnp.zeros((8, 4000), jnp.float32)

    with pytest.raises(ValueError, match="stage"):
        wavlm_encode(pp_params, arch, audio)      # no mesh
    with pytest.raises(NotImplementedError):
        wavlm_encode(pp_params, arch, audio, mesh=mesh,
                     rng=jax.random.PRNGKey(0), deterministic=False)


def test_whisper_encoder_pipelined_matches_sequential():
    from wfl_asr_tpu.models.whisper import (WhisperArch,
                                            init_whisper_encoder,
                                            whisper_encode)

    arch = WhisperArch(num_mel_bins=8, d_model=16, num_layers=4,
                       num_heads=2, ffn_dim=32, max_source_positions=50)
    params = init_whisper_encoder(jax.random.PRNGKey(0), arch)
    rng = np.random.RandomState(5)
    feats = jnp.asarray(rng.randn(8, 8, 100).astype(np.float32))

    ref = jax.jit(lambda p, f: whisper_encode(p, arch, f))(params, feats)

    mesh = pp.make_pp_mesh(4)
    pp_params = dict(params)
    pp_params["layers"] = pp.place_stacked(
        pp.stack_layers(params["layers"]), mesh)
    out = jax.jit(lambda p, f: whisper_encode(p, arch, f, mesh=mesh))(
        pp_params, feats)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_session_pipeline_parallel_matches_plain(tmp_path):
    """model.pipeline_parallel: 2 — end-to-end session parity vs the
    single-device session on a tiny WavLM tagger (forward logits and the
    segment outputs of infer must match)."""
    import dataclasses
    import yaml

    import __graft_entry__ as graft
    from wfl_asr_tpu.checkpoint import save_model_checkpoint
    from wfl_asr_tpu.infer.pipeline import InferenceSession
    from wfl_asr_tpu.models.tagger import init_tagger

    arch = graft._flagship_arch(tiny=True)
    labels = [f"B-p{i}" for i in range(36)] + \
             [f"I-p{i}" for i in range(36)] + ["O"]
    assert len(labels) == arch.num_labels
    save_dir = tmp_path / "save"
    save_dir.mkdir()
    (save_dir / "phonemes.txt").write_text("\n".join(labels) + "\n")
    (save_dir / "langs.txt").write_text("en,0\nja,1\n")
    cfg = {"data": {"sample_rate": 16000, "frame_duration": 0.02},
           "model": {"encoder_type": "wavlm", "num_languages": 2,
                     "lang_emb_dim": 64, "pipeline_parallel": 2},
           "output": {"save_dir": str(save_dir)},
           "postprocess": {"median_filter": 1, "merge_segments": "none"}}
    config_path = save_dir / "config.yaml"
    config_path.write_text(yaml.dump(cfg))
    cfg["model"]["pipeline_parallel"] = 0
    config_plain = save_dir / "config_plain.yaml"
    config_plain.write_text(yaml.dump(cfg))

    params, state = init_tagger(jax.random.PRNGKey(0), arch)
    ckpt = str(save_dir / "best_model.pt")
    save_model_checkpoint(ckpt, params, state, arch)

    rng = np.random.RandomState(6)
    audio = (rng.randn(16000) * 0.3).astype(np.float32)

    plain = InferenceSession(str(config_plain), ckpt, arch=arch)
    ref_logits, ref_offsets = plain.forward(audio, lang_ids=[0, 1])

    sess = InferenceSession(str(config_path), ckpt, arch=arch)
    assert sess.mesh is not None and dict(sess.mesh.shape)["stage"] == 2
    out_logits, out_offsets = sess.forward(audio, lang_ids=[0, 1])

    np.testing.assert_allclose(np.asarray(out_logits),
                               np.asarray(ref_logits),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out_offsets),
                               np.asarray(ref_offsets),
                               rtol=2e-4, atol=2e-4)

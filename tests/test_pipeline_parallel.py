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


def test_whisper_pp_remat_grads_identical():
    """PP + remat on the whisper encoder: remat must actually apply in the
    GPipe branch (it was silently ignored pre-fix) and leave train-mode
    gradients bit-compatible with the non-remat PP path (keys enter the
    checkpointed body as explicit arguments)."""
    from wfl_asr_tpu.models.whisper import (WhisperArch,
                                            init_whisper_encoder,
                                            whisper_encode)

    arch = WhisperArch(num_mel_bins=8, d_model=16, num_layers=4,
                       num_heads=2, ffn_dim=32, max_source_positions=50,
                       dropout=0.1, activation_dropout=0.1)
    params = init_whisper_encoder(jax.random.PRNGKey(0), arch)
    rng = np.random.RandomState(6)
    feats = jnp.asarray(rng.randn(8, 8, 100).astype(np.float32))
    mesh = pp.make_pp_mesh(4)
    pp_params = dict(params)
    pp_params["layers"] = pp.place_stacked(
        pp.stack_layers(params["layers"]), mesh)

    def loss(p, remat):
        h = whisper_encode(p, arch, feats, rng=jax.random.PRNGKey(7),
                           deterministic=False, mesh=mesh, remat=remat)
        return jnp.sum(h * h)

    g_ref = jax.jit(jax.grad(lambda p: loss(p, False)))(pp_params)
    g_rm = jax.jit(jax.grad(lambda p: loss(p, True)))(pp_params)
    for a, b in zip(jax.tree_util.tree_leaves(g_rm),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_whisper_pp_microbatches_threaded(monkeypatch):
    """pp_microbatches reaches the whisper GPipe branch (it was silently
    dropped pre-fix): a spy on gpipe_apply sees the requested count, an
    indivisible request clamps to the largest legal divisor of B/data
    (validation batches are smaller than training's — same knob must
    serve both), and numerics are unchanged either way."""
    from wfl_asr_tpu.models.whisper import (WhisperArch,
                                            init_whisper_encoder,
                                            whisper_encode)
    from wfl_asr_tpu.parallel import pp as pp_mod

    arch = WhisperArch(num_mel_bins=8, d_model=16, num_layers=4,
                       num_heads=2, ffn_dim=32, max_source_positions=50)
    params = init_whisper_encoder(jax.random.PRNGKey(0), arch)
    rng = np.random.RandomState(7)
    feats = jnp.asarray(rng.randn(8, 8, 100).astype(np.float32))
    mesh = pp.make_pp_mesh(4)                      # (data=2, stage=4)
    pp_params = dict(params)
    pp_params["layers"] = pp.place_stacked(
        pp.stack_layers(params["layers"]), mesh)

    seen = []
    real = pp_mod.gpipe_apply

    def spy(*args, **kwargs):
        seen.append(kwargs["microbatches"])
        return real(*args, **kwargs)

    monkeypatch.setattr(pp_mod, "gpipe_apply", spy)

    base = whisper_encode(pp_params, arch, feats, mesh=mesh)
    m2 = whisper_encode(pp_params, arch, feats, mesh=mesh,
                        pp_microbatches=2)
    m3 = whisper_encode(pp_params, arch, feats, mesh=mesh,
                        pp_microbatches=3)         # gcd(3, 8/2=4) -> 1
    assert seen == [4, 2, 1]
    np.testing.assert_allclose(np.asarray(m2), np.asarray(base),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(m3), np.asarray(base),
                               rtol=1e-5, atol=1e-6)


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


def test_gpipe_grads_match_sequential():
    """The GPipe schedule is differentiable: grads of a scalar loss wrt the
    stacked layer weights and the input equal the sequential loop's
    (garbage warmup/drain ticks must receive zero cotangents)."""
    rng = np.random.RandomState(7)
    stacked = _stacked_mlp(rng, 4, 8)
    x = jnp.asarray(rng.randn(8, 6, 8).astype(np.float32))

    def seq_loss(s, a):
        return jnp.sum(_seq_apply(s, a) ** 2)

    mesh = pp.make_pp_mesh(4)
    placed = pp.place_stacked(stacked, mesh)

    def pp_loss(s, a):
        return jnp.sum(pp.gpipe_apply(_mlp_layer, s, a, mesh,
                                      microbatches=4) ** 2)

    g_ref = jax.jit(jax.grad(seq_loss, argnums=(0, 1)))(stacked, x)
    g_pp = jax.jit(jax.grad(pp_loss, argnums=(0, 1)))(placed, x)
    for a, b in zip(jax.tree_util.tree_leaves(g_pp),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_gpipe_rng_threading_dropout():
    """rng= enables stochastic layers: keys are unique per
    (layer, microbatch), deterministic given the base key, and the
    result differs from the rng-free path."""
    rng = np.random.RandomState(8)
    stacked = _stacked_mlp(rng, 4, 8)
    x = jnp.asarray(rng.randn(8, 6, 8).astype(np.float32))

    def layer(lp, h, rows, shr, key=None, layer_key=None):
        h = jnp.tanh(h @ lp["w"] + lp["b"])
        if key is not None:
            keep = jax.random.bernoulli(key, 0.5, h.shape)
            h = jnp.where(keep, h / 0.5, 0.0)
        return h

    mesh = pp.make_pp_mesh(4)
    placed = pp.place_stacked(stacked, mesh)
    key = jax.random.PRNGKey(3)

    run = jax.jit(lambda s, a, k: pp.gpipe_apply(
        layer, s, a, mesh, microbatches=4, rng=k))
    out1 = run(placed, x, key)
    out2 = run(placed, x, key)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))

    out3 = run(placed, x, jax.random.PRNGKey(4))
    assert not np.allclose(np.asarray(out1), np.asarray(out3))

    det = jax.jit(lambda s, a: pp.gpipe_apply(
        lambda lp, h, rows, shr: layer(lp, h, rows, shr),
        s, a, mesh, microbatches=4))(placed, x)
    assert not np.allclose(np.asarray(out1), np.asarray(det))


def test_gpipe_layer_key_is_whole_batch():
    """layer_key is identical for every microbatch of a layer (the
    whole-batch LayerDrop contract): a layer that adds a bernoulli draw
    from layer_key must shift ALL batch rows by the same per-layer
    amount, regardless of which microbatch they rode in."""
    rng = np.random.RandomState(9)
    stacked = _stacked_mlp(rng, 4, 8)
    x = jnp.asarray(rng.randn(8, 6, 8).astype(np.float32))

    def layer(lp, h, rows, shr, key=None, layer_key=None):
        if layer_key is None:
            return h
        draw = jax.random.bernoulli(
            jax.random.fold_in(layer_key, 0x4C44), 0.5)
        return h + draw.astype(h.dtype)

    mesh = pp.make_pp_mesh(4)
    placed = pp.place_stacked(stacked, mesh)
    out = jax.jit(lambda s, a, k: pp.gpipe_apply(
        layer, s, a, mesh, microbatches=4,
        rng=k))(placed, x, jax.random.PRNGKey(5))
    shift = np.asarray(out) - np.asarray(x)
    # every element shifted by the same integer total (sum of the four
    # per-layer whole-batch draws) — per-microbatch draws would differ
    # between row groups
    assert np.allclose(shift, shift.flat[0])
    assert float(shift.flat[0]).is_integer()


def test_wavlm_pipelined_train_mode_runs():
    """Train-mode PP forward (dropout active under the tick scan):
    deterministic given the key, differs across keys, grads finite."""
    import dataclasses
    import __graft_entry__ as graft
    from wfl_asr_tpu.models.wavlm import init_wavlm, wavlm_encode

    arch = dataclasses.replace(graft._flagship_arch(tiny=True).wavlm,
                               num_layers=4, hidden_dropout=0.2)
    params = init_wavlm(jax.random.PRNGKey(0), arch)
    mesh = pp.make_pp_mesh(4)
    pp_params = dict(params)
    pp_params["layers"] = pp.place_stacked(
        pp.stack_layers(params["layers"]), mesh)
    rng = np.random.RandomState(9)
    audio = jnp.asarray((rng.randn(8, 4000) * 0.3).astype(np.float32))

    run = jax.jit(lambda p, a, k: wavlm_encode(
        p, arch, a, rng=k, deterministic=False, mesh=mesh))
    out1 = run(pp_params, audio, jax.random.PRNGKey(1))
    out2 = run(pp_params, audio, jax.random.PRNGKey(1))
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    out3 = run(pp_params, audio, jax.random.PRNGKey(2))
    assert not np.allclose(np.asarray(out1), np.asarray(out3))

    def loss(p):
        h = wavlm_encode(p, arch, audio, rng=jax.random.PRNGKey(1),
                         deterministic=False, mesh=mesh)
        return jnp.sum(h * h)

    g = jax.jit(jax.grad(loss))(pp_params)
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_pp_train_step_matches_unsharded():
    """Full jitted train step on the ('data','stage') mesh with stacked
    encoder layers == the single-device step (dropouts zeroed so the PP
    key-derivation difference is inert)."""
    import dataclasses
    import optax
    import __graft_entry__ as graft
    from wfl_asr_tpu.models.tagger import init_tagger
    from wfl_asr_tpu.train.loop import make_train_step
    from wfl_asr_tpu.train.prodigy import prodigy
    from wfl_asr_tpu.parallel import shard_batch

    arch = graft._flagship_arch(tiny=True)
    arch = dataclasses.replace(
        arch, conformer_dropout=0.0,
        wavlm=dataclasses.replace(arch.wavlm, num_layers=4,
                                  hidden_dropout=0.0))
    params, model_state = init_tagger(jax.random.PRNGKey(0), arch)

    tx = optax.inject_hyperparams(
        lambda learning_rate: prodigy(learning_rate=learning_rate))(
        learning_rate=1.0)

    rng = np.random.RandomState(10)
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
    step_rng = jax.random.PRNGKey(21)
    copy = lambda tree: jax.tree_util.tree_map(np.array, tree)

    def run(mesh):
        p = copy(params)
        ms = copy(model_state)
        if mesh is not None:
            p = dict(p)
            enc = dict(p["encoder"])
            enc["layers"] = pp.stack_layers(enc["layers"])
            p["encoder"] = enc
            os_ = tx.init(p)
            p = pp.shard_params_pp(p, mesh)
            os_ = jax.tree_util.tree_map(jax.device_put, os_,
                                         pp.pp_shardings(os_, mesh))
            from wfl_asr_tpu.parallel import replicate
            ms = replicate(ms, mesh)
            arrays = shard_batch({k: jnp.asarray(v)
                                  for k, v in host.items()}, mesh)
        else:
            os_ = tx.init(p)
            arrays = {k: jnp.asarray(v) for k, v in host.items()}
        step = make_train_step(arch, 0.1, 3.0, tx, mesh=mesh)
        out = step(p, ms, os_, step_rng,
                   arrays["audio"], arrays["labels"], arrays["lang_ids"],
                   arrays["off_frames"], arrays["off_channels"],
                   arrays["off_fracs"], arrays["off_valid"],
                   max_label_len=t)
        _, _, _, metrics, pred_ids, _ = out
        return ({k: float(v) for k, v in metrics.items()},
                np.asarray(pred_ids))

    m_ref, ids_ref = run(None)
    mesh = pp.make_pp_mesh(2)                    # data=4, stage=2
    m_pp, ids_pp = run(mesh)
    for k in m_ref:
        np.testing.assert_allclose(m_pp[k], m_ref[k], rtol=2e-4,
                                   err_msg=k)
    np.testing.assert_array_equal(ids_pp, ids_ref)


def test_train_driver_pipeline_parallel(tmp_path):
    """training.pipeline_parallel=2 runs the full driver end to end on the
    virtual 8-device mesh with a tiny custom WavLM — stacked-layer
    placement, sharded optimizer state, canonical (unstacked) checkpoint
    saves, and a resume."""
    import os
    import random as pyrandom
    from tests.test_preprocess import make_fixture_dataset, make_config
    from wfl_asr_tpu.preprocess import preprocess as run_preprocess
    from wfl_asr_tpu.train.loop import train
    from wfl_asr_tpu.checkpoint import load_model_checkpoint
    from wfl_asr_tpu.config import Config
    from wfl_asr_tpu.models.tagger import TaggerArch

    rng = pyrandom.Random(31)
    data_dir = make_fixture_dataset(str(tmp_path), rng, langs=("en",),
                                    files_per_lang=6)
    save_dir = str(tmp_path / "save")
    config = make_config(data_dir, save_dir, [])
    config["data"]["num_val_files"] = 2
    config["model"].update({
        "encoder_type": "wavlm", "wavlm_model": "tiny-custom",
        "num_conformer_layers": 1, "lang_emb_dim": 8,
        "enable_dilated_conv": False,
        "encoder_arch_overrides": {
            "hidden_size": 32, "num_layers": 4, "num_heads": 2,
            "intermediate_size": 64, "conv_dim": [16, 16],
            "conv_kernel": [10, 8], "conv_stride": [5, 8],
            "num_conv_pos_embeddings": 16,
            "num_conv_pos_embedding_groups": 4,
            "num_buckets": 20, "max_distance": 50,
        },
    })
    config["training"].update({
        "batch_size": 4, "max_steps": 2, "val_check_interval": 2,
        "seed": 0, "data_parallel": True, "pipeline_parallel": 2,
        "optimizer": "Prodigy", "learning_rate": 1.0,
        "scheduler": "ConstantLR",
    })
    run_preprocess(data_dir, config)
    cfg_path = os.path.join(save_dir, "config.yaml")
    train(cfg_path)
    last = os.path.join(save_dir, "last_model.pt")
    assert os.path.exists(last)

    # checkpoint is canonical: loads as an UNSTACKED layer list
    cfg = Config.load(cfg_path)
    n_labels = len(open(os.path.join(save_dir,
                                     "phonemes.txt")).read().split())
    arch = TaggerArch.from_config(cfg, n_labels)
    p, _ = load_model_checkpoint(last, arch)
    assert isinstance(p["encoder"]["layers"], list)
    assert len(p["encoder"]["layers"]) == 4

    # resume: the sidecar restores into the STACKED optimizer template
    config["training"]["max_steps"] = 3
    import yaml
    yaml.safe_dump(config, open(cfg_path, "w"))
    train(cfg_path)


def test_pp_remat_grads_match():
    """training.remat composes with PP: grads through the rematerialized
    GPipe schedule == the plain PP grads (same keys, dropout active)."""
    import dataclasses
    import __graft_entry__ as graft
    from wfl_asr_tpu.models.wavlm import init_wavlm, wavlm_encode

    arch = dataclasses.replace(graft._flagship_arch(tiny=True).wavlm,
                               num_layers=4, hidden_dropout=0.2,
                               layerdrop=0.3)
    params = init_wavlm(jax.random.PRNGKey(0), arch)
    mesh = pp.make_pp_mesh(4)
    pp_params = dict(params)
    pp_params["layers"] = pp.place_stacked(
        pp.stack_layers(params["layers"]), mesh)
    rng = np.random.RandomState(11)
    audio = jnp.asarray((rng.randn(8, 4000) * 0.3).astype(np.float32))
    key = jax.random.PRNGKey(13)

    def loss(p, remat):
        h = wavlm_encode(p, arch, audio, rng=key, deterministic=False,
                         mesh=mesh, remat=remat)
        return jnp.sum(h * h)

    g_ref = jax.jit(jax.grad(lambda p: loss(p, False)))(pp_params)
    g_rm = jax.jit(jax.grad(lambda p: loss(p, True)))(pp_params)
    for a, b in zip(jax.tree_util.tree_leaves(g_rm),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)

"""Data-parallel mesh tests on the virtual 8-device CPU platform
(SURVEY.md §4 "Multi-device without a cluster")."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_mesh_shapes():
    from wfl_asr_tpu.parallel import make_mesh
    mesh = make_mesh()
    assert mesh.shape["data"] * mesh.shape["model"] == 8
    mesh4 = make_mesh(num_devices=4)
    assert mesh4.shape["data"] == 4
    mesh42 = make_mesh(num_devices=4, model_parallel=2)
    assert mesh42.shape == {"data": 2, "model": 2}
    with pytest.raises(ValueError):
        make_mesh(num_devices=6, model_parallel=4)


def test_shard_batch_pads_and_shards():
    from wfl_asr_tpu.parallel import make_mesh, shard_batch
    mesh = make_mesh()
    batch = {"audio": np.ones((5, 100), np.float32),
             "labels": np.ones((5, 10), np.int64)}
    out = shard_batch(batch, mesh, pad_value_map={"labels": -100})
    assert out["audio"].shape == (8, 100)
    assert out["labels"].shape == (8, 10)
    assert np.all(np.asarray(out["labels"][5:]) == -100)
    assert np.all(np.asarray(out["audio"][5:]) == 0.0)
    # sharded over 'data'
    assert len(out["audio"].sharding.device_set) == 8


def test_sharded_inference_matches_single_device(tmp_path):
    """forward/forward_many with a mesh (rows sharded on 'data', params
    replicated) are bit-equal to the single-device session — the serving
    path's DP story (VERDICT r1 missing #6)."""
    import yaml

    from wfl_asr_tpu.checkpoint import save_model_checkpoint
    from wfl_asr_tpu.infer.pipeline import InferenceSession
    from wfl_asr_tpu.models.tagger import TaggerArch, init_tagger
    from wfl_asr_tpu.parallel import make_mesh

    labels = [f"B-p{i}" for i in range(3)] + \
             [f"I-p{i}" for i in range(3)] + ["O"]
    save_dir = tmp_path / "save"
    save_dir.mkdir()
    (save_dir / "phonemes.txt").write_text("\n".join(sorted(labels)) + "\n")
    (save_dir / "langs.txt").write_text("en,0\nja,1\n")
    cfg = {"data": {"sample_rate": 16000, "frame_duration": 0.02,
                    "n_mels": 40},
           "model": {"encoder_type": "none", "num_languages": 2,
                     "lang_emb_dim": 8},
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
    audios = [(rng.randn(n) * 0.3).astype(np.float32)
              for n in (16000, 9000, 25000)]  # deliberately uneven rows: 3
    langs = [[0, 1], [1], [0, 1]]             # ... x langs = 5 rows, pad→8

    single = InferenceSession(str(config_path), ckpt, arch=arch)
    dp = InferenceSession(str(config_path), ckpt, arch=arch,
                          mesh=make_mesh())

    # SPMD partitioning reorders float ops, so cross-sharding outputs are
    # equal to float noise (~1e-7), not bit-equal (bit-parity holds only
    # within one sharding — tests/test_masked_inference.py).
    out_single = single.forward_many(audios, langs)
    out_dp = dp.forward_many(audios, langs)
    for (ls, os_), (ld, od) in zip(out_single, out_dp):
        np.testing.assert_allclose(ls, ld, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(os_, od, rtol=1e-4, atol=1e-5)

    l1, o1 = single.forward(audios[0], [0, 1])
    l2, o2 = dp.forward(audios[0], [0, 1])
    np.testing.assert_allclose(l1, l2, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(o1, o2, rtol=1e-4, atol=1e-5)


def test_dp_train_step_matches_single_device():
    """A DP step over 8 devices produces the same params as the same step on
    one device (global loss-mean + Prodigy scalar reductions are preserved
    by XLA collectives)."""
    import optax
    import __graft_entry__ as graft
    from wfl_asr_tpu.models.tagger import init_tagger
    from wfl_asr_tpu.parallel import make_mesh, replicate, shard_batch
    from wfl_asr_tpu.train.loop import make_train_step
    from wfl_asr_tpu.train.prodigy import prodigy

    arch = graft._flagship_arch(tiny=True)
    params, model_state = init_tagger(jax.random.PRNGKey(0), arch)

    def build(learning_rate):
        return prodigy(learning_rate=learning_rate)

    tx = optax.inject_hyperparams(build)(learning_rate=1.0)
    opt_state = tx.init(params)
    train_step = make_train_step(arch, 0.1, 3.0, tx)

    rng = np.random.RandomState(0)
    b, s, t = 8, 4000, 20
    batch = {
        "audio": (rng.randn(b, s) * 0.1).astype(np.float32),
        "labels": rng.randint(0, arch.num_labels, size=(b, t)).astype(np.int64),
        "lang_ids": rng.randint(0, 2, size=b).astype(np.int32),
        "off_frames": rng.randint(0, t, size=(b, 8)).astype(np.int32),
        "off_channels": rng.randint(0, 2, size=(b, 8)).astype(np.int32),
        "off_fracs": rng.rand(b, 8).astype(np.float32),
        "off_valid": np.ones((b, 8), bool),
    }
    step_rng = jax.random.PRNGKey(1)

    def run(p, ms, os_, arrays):
        return train_step(p, ms, os_, step_rng,
                          arrays["audio"], arrays["labels"],
                          arrays["lang_ids"], arrays["off_frames"],
                          arrays["off_channels"], arrays["off_fracs"],
                          arrays["off_valid"], max_label_len=t)

    # Host copies up front — the train step donates its input buffers.
    params_host = jax.device_get(params)
    state_host = jax.device_get(model_state)
    opt_host = jax.device_get(opt_state)

    # single device
    single = run(jax.tree_util.tree_map(jnp.asarray, params_host),
                 jax.tree_util.tree_map(jnp.asarray, state_host),
                 jax.tree_util.tree_map(jnp.asarray, opt_host),
                 {k: jnp.asarray(v) for k, v in batch.items()})
    single_params = jax.device_get(single[0])
    single_loss = float(single[3]["loss"])

    # 8-device DP
    mesh = make_mesh()
    p_r = replicate(params_host, mesh)
    ms_r = replicate(state_host, mesh)
    os_r = replicate(opt_host, mesh)
    sharded = shard_batch(batch, mesh, pad_value_map={"labels": -100})
    with mesh:
        dp = run(p_r, ms_r, os_r, sharded)
    dp_params = jax.device_get(dp[0])
    dp_loss = float(dp[3]["loss"])

    assert dp_loss == pytest.approx(single_loss, rel=1e-5)
    flat_s = jax.tree_util.tree_leaves(single_params)
    flat_d = jax.tree_util.tree_leaves(dp_params)
    for a, b_ in zip(flat_s, flat_d):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=1e-6)


def test_tensor_parallel_matches_replicated():
    """Megatron-style TP shardings (parallel/tp.py) change layout, not
    math: a (data=4, model=2) mesh forward on the tiny WavLM tagger equals
    the replicated single-layout forward, and a grad step agrees too —
    the 'TP is a config change' design claim of SURVEY §2."""
    import functools

    from wfl_asr_tpu.models.tagger import apply_tagger, init_tagger
    from wfl_asr_tpu.parallel import (batch_sharding, make_mesh, replicate,
                                      shard_params_tp, tp_shardings)
    from jax.sharding import PartitionSpec as P
    import __graft_entry__ as graft

    arch = graft._flagship_arch(tiny=True)
    params, state = init_tagger(jax.random.PRNGKey(0), arch)
    mesh = make_mesh(model_parallel=2)
    assert mesh.shape == {"data": 4, "model": 2}

    # attention projections actually sharded over 'model'
    specs = tp_shardings(params, mesh)
    qspec = specs["encoder"]["layers"][0]["q"]["w"].spec
    assert qspec == P(None, "model")
    ospec = specs["encoder"]["layers"][0]["out"]["w"].spec
    assert ospec == P("model", None)
    assert specs["encoder"]["rel_attn_embed"]["w"].spec == P(None, "model")

    rng = np.random.RandomState(0)
    audio = jnp.asarray((rng.randn(4, 4000) * 0.3).astype(np.float32))
    lang_ids = jnp.asarray(np.array([0, 1, 0, 1], np.int32))

    @jax.jit
    def fwd(params, state, audio, lang_ids):
        logits, offsets, _ = apply_tagger(params, state, arch, audio,
                                          lang_ids)
        return logits, offsets

    p_rep = replicate(params, mesh)
    s_rep = replicate(state, mesh)
    audio_sh = jax.device_put(audio, batch_sharding(mesh, 2))
    lang_sh = jax.device_put(lang_ids, batch_sharding(mesh, 1))
    ref_logits, ref_offsets = fwd(p_rep, s_rep, audio_sh, lang_sh)

    p_tp = shard_params_tp(params, mesh)
    tp_logits, tp_offsets = fwd(p_tp, s_rep, audio_sh, lang_sh)

    np.testing.assert_allclose(np.asarray(tp_logits),
                               np.asarray(ref_logits), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(tp_offsets),
                               np.asarray(ref_offsets), atol=1e-4, rtol=1e-4)

    # gradients agree through the TP layout too
    def loss(p):
        logits, _, _ = apply_tagger(p, state, arch, audio, lang_ids)
        return jnp.mean(logits.astype(jnp.float32) ** 2)

    g_rep = jax.jit(jax.grad(loss))(p_rep)
    g_tp = jax.jit(jax.grad(loss))(p_tp)
    leaf_rep = jax.tree_util.tree_leaves(g_rep)
    leaf_tp = jax.tree_util.tree_leaves(g_tp)
    assert len(leaf_rep) == len(leaf_tp)
    for a, b in zip(leaf_rep, leaf_tp):  # EVERY leaf, incl. heads/classifier
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-4, rtol=2e-3)


def test_train_driver_tensor_parallel(tmp_path):
    """training.model_parallel=2 runs the full driver end to end on the
    virtual 8-device mesh (data=4 × model=2) — TP as a config change."""
    import os
    import random as pyrandom
    from tests.test_preprocess import make_fixture_dataset, make_config
    from wfl_asr_tpu.preprocess import preprocess as run_preprocess
    from wfl_asr_tpu.train.loop import train

    rng = pyrandom.Random(21)
    data_dir = make_fixture_dataset(str(tmp_path), rng, langs=("en",),
                                    files_per_lang=6)
    save_dir = str(tmp_path / "save")
    config = make_config(data_dir, save_dir, [])
    config["data"]["num_val_files"] = 2
    config["model"].update({"encoder_type": "none",
                            "num_conformer_layers": 1,
                            "lang_emb_dim": 8})
    config["training"].update({
        "batch_size": 4, "max_steps": 2, "val_check_interval": 2,
        "seed": 0, "data_parallel": True, "model_parallel": 2,
        "optimizer": "Prodigy", "learning_rate": 1.0,
        "scheduler": "ConstantLR",
    })
    run_preprocess(data_dir, config)
    train(os.path.join(save_dir, "config.yaml"))
    assert os.path.exists(os.path.join(save_dir, "last_model.pt"))


def test_maybe_initialize_distributed_guard():
    """Initialize iff cluster env vars are present; exactly once (multi-host
    can't be integration-tested on a single-host box, so the initializer is
    injected)."""
    from wfl_asr_tpu.parallel import mesh as mesh_mod

    calls = []
    orig = mesh_mod._dist_initialized
    try:
        mesh_mod._dist_initialized = False
        # no cluster vars → no-op
        assert mesh_mod.maybe_initialize_distributed(
            env={}, _initialize=lambda: calls.append(1)) is False
        assert calls == []
        # coordinator var present → initializes once
        env = {"JAX_COORDINATOR_ADDRESS": "10.0.0.1:8476"}
        assert mesh_mod.maybe_initialize_distributed(
            env=env, _initialize=lambda: calls.append(1)) is True
        assert calls == [1]
        # second call is a no-op even with the env present
        assert mesh_mod.maybe_initialize_distributed(
            env=env, _initialize=lambda: calls.append(1)) is False
        assert calls == [1]
    finally:
        mesh_mod._dist_initialized = orig


def test_maybe_initialize_distributed_single_host_hostnames():
    """TPU_WORKER_HOSTNAMES with a single host (the axon relay exports
    'localhost') must NOT trip the guard — jax.distributed.initialize dies
    without a coordinator address on single-host boxes. Multiple
    comma-separated hosts do count; an unresolvable-coordinator ValueError
    degrades to a no-op instead of killing the run."""
    from wfl_asr_tpu.parallel import mesh as mesh_mod

    calls = []
    orig = mesh_mod._dist_initialized
    try:
        mesh_mod._dist_initialized = False
        assert mesh_mod.maybe_initialize_distributed(
            env={"TPU_WORKER_HOSTNAMES": "localhost"},
            _initialize=lambda: calls.append(1)) is False
        assert calls == []
        assert mesh_mod.maybe_initialize_distributed(
            env={"TPU_WORKER_HOSTNAMES": "host-0,host-1"},
            _initialize=lambda: calls.append(1)) is True
        assert calls == [1]

        mesh_mod._dist_initialized = False

        def no_coordinator():
            raise ValueError("coordinator_address should be defined.")

        assert mesh_mod.maybe_initialize_distributed(
            env={"TPU_WORKER_HOSTNAMES": "host-0,host-1"},
            _initialize=no_coordinator) is False
    finally:
        mesh_mod._dist_initialized = orig


def test_maybe_initialize_distributed_tolerates_prior_init():
    """A launcher that already initialized jax.distributed raises
    RuntimeError from initialize(); the guard must swallow it."""
    from wfl_asr_tpu.parallel import mesh as mesh_mod

    def boom():
        raise RuntimeError("jax.distributed is already initialized")

    orig = mesh_mod._dist_initialized
    try:
        mesh_mod._dist_initialized = False
        assert mesh_mod.maybe_initialize_distributed(
            env={"MEGASCALE_COORDINATOR_ADDRESS": "x"},
            _initialize=boom) is True
    finally:
        mesh_mod._dist_initialized = orig


def test_multihost_signal_classification():
    """JAX_PROCESS_COUNT=1 is a single-process launch (no-op); the generic
    COORDINATOR_ADDRESS name (used by unrelated sidecars) is only a
    heuristic hint — its init failures degrade instead of aborting."""
    from wfl_asr_tpu.parallel import mesh as mesh_mod

    assert mesh_mod._multihost_signal({}) is None
    assert mesh_mod._multihost_signal({"JAX_PROCESS_COUNT": "1"}) is None
    assert mesh_mod._multihost_signal(
        {"JAX_PROCESS_COUNT": "4"}) == "explicit"
    assert mesh_mod._multihost_signal(
        {"JAX_COORDINATOR_ADDRESS": "x"}) == "explicit"
    assert mesh_mod._multihost_signal(
        {"COORDINATOR_ADDRESS": "x"}) == "heuristic"
    assert mesh_mod._multihost_signal(
        {"TPU_WORKER_HOSTNAMES": "a,b"}) == "heuristic"
    assert mesh_mod._multihost_signal(
        {"TPU_WORKER_HOSTNAMES": "localhost"}) is None

    # heuristic-only ValueError degrades (no abort)
    calls = []

    def no_coordinator():
        calls.append(1)
        raise ValueError("coordinator_address should be defined.")

    orig = mesh_mod._dist_initialized
    try:
        mesh_mod._dist_initialized = False
        assert mesh_mod.maybe_initialize_distributed(
            env={"COORDINATOR_ADDRESS": "sidecar:9999"},
            _initialize=no_coordinator) is False
        assert calls == [1]
    finally:
        mesh_mod._dist_initialized = orig


def test_maybe_initialize_distributed_propagates_real_failures():
    """Only a double-init RuntimeError is benign. A coordinator
    handshake/connection failure must propagate — swallowing it would let
    N hosts train as N independent unsynced single-process runs."""
    import pytest
    from wfl_asr_tpu.parallel import mesh as mesh_mod

    def handshake_fail():
        raise RuntimeError("Barrier timed out connecting to coordinator")

    orig = mesh_mod._dist_initialized
    try:
        mesh_mod._dist_initialized = False
        with pytest.raises(RuntimeError, match="Barrier timed out"):
            mesh_mod.maybe_initialize_distributed(
                env={"JAX_COORDINATOR_ADDRESS": "10.0.0.1:8476"},
                _initialize=handshake_fail)
        assert mesh_mod._dist_initialized is False
    finally:
        mesh_mod._dist_initialized = orig


def test_maybe_initialize_distributed_valueerror_latches():
    """A heuristic-only trip (multi-host TPU_WORKER_HOSTNAMES, no explicit
    coordinator var) with an unresolvable coordinator degrades to
    single-process AND latches — the warning must not re-print on every
    session/train call. With an EXPLICIT coordinator var the same
    ValueError is a configuration error and must propagate (degrading
    would silently train N hosts unsynced)."""
    import pytest
    from wfl_asr_tpu.parallel import mesh as mesh_mod

    calls = []

    def no_coordinator():
        calls.append(1)
        raise ValueError("coordinator_address should be defined.")

    orig = mesh_mod._dist_initialized
    try:
        mesh_mod._dist_initialized = False
        env = {"TPU_WORKER_HOSTNAMES": "host-0,host-1"}
        assert mesh_mod.maybe_initialize_distributed(
            env=env, _initialize=no_coordinator) is False
        assert mesh_mod.maybe_initialize_distributed(
            env=env, _initialize=no_coordinator) is False
        assert calls == [1]

        mesh_mod._dist_initialized = False
        with pytest.raises(ValueError, match="coordinator_address"):
            mesh_mod.maybe_initialize_distributed(
                env={"JAX_COORDINATOR_ADDRESS": "nowhere"},
                _initialize=no_coordinator)
    finally:
        mesh_mod._dist_initialized = orig

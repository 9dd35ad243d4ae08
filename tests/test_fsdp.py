"""FSDP (parallel/fsdp.py): ZeRO-3-style param + optimizer-state sharding
over the 'data' axis, on the virtual 8-device CPU platform.

The reference is single-device (SURVEY.md §2 "Parallelism"); FSDP is a
TPU-native extension (scaling-book recipe: annotate shardings, GSPMD
inserts the gathers / reduce-scatters). Pins that (a) the shape-driven
spec rule does what the docstring says, (b) a Prodigy train step with
FSDP placement is numerically identical to the replicated-DP step while
actually sharding the big leaves, and (c) the train() driver flag works
end to end (and rejects invalid compositions).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from wfl_asr_tpu.parallel import (batch_sharding, fsdp_shardings, make_mesh,
                                  replicate, shard_batch, shard_params_fsdp)
from wfl_asr_tpu.parallel.fsdp import fsdp_spec


def _tiny_arch():
    import __graft_entry__ as graft
    return graft._flagship_arch(tiny=True)


def test_fsdp_spec_rules():
    # largest divisible dim shards; ties break to the earliest axis
    assert fsdp_spec((768, 3072), 8, min_size=1) == P(None, "data")
    assert fsdp_spec((3072, 768), 8, min_size=1) == P("data", None)
    assert fsdp_spec((64, 64), 8, min_size=1) == P("data", None)
    # largest dim indivisible -> falls to the next divisible one
    assert fsdp_spec((1499, 768), 8, min_size=1) == P(None, "data")
    # nothing divisible, or scalar/small leaves -> replicate
    assert fsdp_spec((7, 9), 8, min_size=1) == P()
    assert fsdp_spec((), 8, min_size=1) == P()
    assert fsdp_spec((768, 768), 8, min_size=10**9) == P()


def test_fsdp_placement_shards_and_reassembles():
    mesh = make_mesh()  # (data=8, model=1)
    w = jnp.asarray(np.random.RandomState(0).randn(64, 16), np.float32)
    placed = shard_params_fsdp({"w": w, "b": jnp.zeros(16)}, mesh,
                               min_size=64)
    spec = placed["w"].sharding.spec
    assert tuple(spec) == ("data", None)
    # per-device shard is 1/8 of the rows
    shard_shape = placed["w"].sharding.shard_shape(placed["w"].shape)
    assert shard_shape == (8, 16)
    # small leaf replicates
    assert placed["b"].sharding.spec == P()
    # device_get reassembles the full array bit-exactly (checkpoint path)
    np.testing.assert_array_equal(np.asarray(placed["w"]), np.asarray(w))


def test_fsdp_train_step_matches_replicated():
    """One Prodigy train step with params+opt-state FSDP-sharded (plus the
    reduce-scatter grad constraint) == the replicated-DP step: sharding
    relocates bytes, never changes numerics. The updated params must keep
    the FSDP layout (no silent gather-back)."""
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
    mesh = make_mesh()

    def run(use_fsdp):
        # fresh host copies per run: the train step donates its buffers
        host_copy = lambda tree: jax.tree_util.tree_map(
            lambda x: np.array(x), tree)
        p0 = host_copy(params)
        opt0 = tx.init(p0)
        if use_fsdp:
            p = shard_params_fsdp(p0, mesh, min_size=64)
            os_ = shard_params_fsdp(opt0, mesh, min_size=64)
            shardings = fsdp_shardings(p0, mesh, min_size=64)
        else:
            p = replicate(p0, mesh)
            os_ = replicate(opt0, mesh)
            shardings = None
        ms = replicate(host_copy(model_state), mesh)
        arrays = {k: jax.device_put(jnp.asarray(v),
                                    batch_sharding(mesh, np.ndim(v)))
                  for k, v in host.items()}
        step = make_train_step(arch, 0.1, 3.0, tx, mesh=mesh,
                               param_shardings=shardings)
        out = step(p, ms, os_, step_rng,
                   arrays["audio"], arrays["labels"], arrays["lang_ids"],
                   arrays["off_frames"], arrays["off_channels"],
                   arrays["off_fracs"], arrays["off_valid"],
                   max_label_len=t)
        new_params, _, _, metrics, pred_ids, _ = out
        return (new_params, {k: float(v) for k, v in metrics.items()},
                np.asarray(pred_ids))

    p_dp, m_dp, ids_dp = run(False)
    p_fs, m_fs, ids_fs = run(True)
    for k in m_dp:
        np.testing.assert_allclose(m_fs[k], m_dp[k], rtol=1e-5,
                                   err_msg=k)
    np.testing.assert_array_equal(ids_fs, ids_dp)

    # numerically identical updated params...
    flat_dp = jax.tree_util.tree_leaves(p_dp)
    flat_fs = jax.tree_util.tree_leaves(p_fs)
    for a, b_ in zip(flat_dp, flat_fs):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=1e-5, atol=1e-6)
    # ...that stayed sharded: at least one big leaf keeps 'data' in its
    # spec and a reduced per-device shard.
    sharded = [x for x in flat_fs
               if "data" in tuple(getattr(x.sharding, "spec", ()))]
    assert sharded, "no updated parameter kept an FSDP sharding"
    x = max(sharded, key=lambda a: a.size)
    shard_elems = np.prod(x.sharding.shard_shape(x.shape))
    assert shard_elems * 8 == x.size


def test_train_driver_fsdp(tmp_path, monkeypatch):
    """training.fsdp: true end to end on the 8-device CPU mesh: trains,
    validates, checkpoints (device_get reassembles shards); the saved
    torch-format checkpoint stays canonical."""
    import json as _json
    import random as pyrandom

    from tests.test_preprocess import make_config, make_fixture_dataset
    from wfl_asr_tpu.preprocess import preprocess as run_preprocess
    import wfl_asr_tpu.parallel.fsdp as fsdp_mod
    from wfl_asr_tpu.train.loop import train

    # tiny test model: let its small leaves actually shard
    monkeypatch.setattr(fsdp_mod, "MIN_SHARD_SIZE", 64)

    rng = pyrandom.Random(23)
    data_dir = make_fixture_dataset(str(tmp_path), rng, langs=("en",),
                                    files_per_lang=10)
    save_dir = str(tmp_path / "save")
    config = make_config(data_dir, save_dir, [])
    config["data"]["num_val_files"] = 2
    config["model"].update({
        "encoder_type": "none", "enable_bilstm": False,
        "num_conformer_layers": 1, "conformer_heads": 2,
        "conformer_ff_expansion": 2, "conformer_kernel_size": 31,
        "lang_emb_dim": 8,
    })
    config["training"].update({
        "batch_size": 8, "optimizer": "AdamW", "learning_rate": 1e-3,
        "scheduler": "ConstantLR", "label_smoothing": 0.1,
        "max_steps": 2, "val_check_interval": 2, "max_checkpoints": 1,
        "seed": 0, "fsdp": True,
    })
    run_preprocess(data_dir, config)
    train(os.path.join(save_dir, "config.yaml"))
    assert os.path.exists(os.path.join(save_dir, "best_model.pt"))
    events = [_json.loads(l) for l in
              open(os.path.join(save_dir, "metrics.jsonl"))]
    assert [e["step"] for e in events if e["event"] == "train"] == [1, 2]


def test_fsdp_rejects_model_parallel(tmp_path):
    import random as pyrandom

    from tests.test_preprocess import make_config, make_fixture_dataset
    from wfl_asr_tpu.preprocess import preprocess as run_preprocess
    from wfl_asr_tpu.train.loop import train

    rng = pyrandom.Random(29)
    data_dir = make_fixture_dataset(str(tmp_path), rng, langs=("en",),
                                    files_per_lang=4)
    save_dir = str(tmp_path / "save")
    config = make_config(data_dir, save_dir, [])
    config["model"].update({
        "encoder_type": "none", "enable_bilstm": False,
        "num_conformer_layers": 1, "conformer_heads": 2,
        "conformer_ff_expansion": 2, "conformer_kernel_size": 31,
        "lang_emb_dim": 8,
    })
    config["training"].update({
        "batch_size": 8, "max_steps": 1, "seed": 0,
        "fsdp": True, "model_parallel": 2,
    })
    run_preprocess(data_dir, config)
    with pytest.raises(ValueError, match="fsdp"):
        train(os.path.join(save_dir, "config.yaml"))


def test_train_driver_fsdp_with_grad_accumulation(tmp_path, monkeypatch):
    """FSDP composes with grad_accumulation: micro-batch grads go through
    make_grad_step's reduce-scatter constraint, the f32 accumulator stays
    sharded like the params, and one optimizer update lands per N micros."""
    import json as _json
    import random as pyrandom

    from tests.test_preprocess import make_config, make_fixture_dataset
    from wfl_asr_tpu.preprocess import preprocess as run_preprocess
    import wfl_asr_tpu.parallel.fsdp as fsdp_mod
    from wfl_asr_tpu.train.loop import train

    monkeypatch.setattr(fsdp_mod, "MIN_SHARD_SIZE", 64)

    rng = pyrandom.Random(31)
    data_dir = make_fixture_dataset(str(tmp_path), rng, langs=("en",),
                                    files_per_lang=10)
    save_dir = str(tmp_path / "save")
    config = make_config(data_dir, save_dir, [])
    config["data"]["num_val_files"] = 2
    config["model"].update({
        "encoder_type": "none", "enable_bilstm": False,
        "num_conformer_layers": 1, "conformer_heads": 2,
        "conformer_ff_expansion": 2, "conformer_kernel_size": 31,
        "lang_emb_dim": 8,
    })
    config["training"].update({
        "batch_size": 8, "optimizer": "AdamW", "learning_rate": 1e-3,
        "scheduler": "ConstantLR", "label_smoothing": 0.1,
        "max_steps": 2, "val_check_interval": 2, "max_checkpoints": 1,
        "seed": 0, "fsdp": True, "grad_accumulation": 2,
    })
    run_preprocess(data_dir, config)
    train(os.path.join(save_dir, "config.yaml"))
    assert os.path.exists(os.path.join(save_dir, "best_model.pt"))
    events = [_json.loads(l) for l in
              open(os.path.join(save_dir, "metrics.jsonl"))]
    assert [e["step"] for e in events if e["event"] == "train"] == [1, 2]


def test_fsdp_composes_with_remat():
    """FSDP placement + training.remat on the tiny WavLM: one train step
    matches the replicated non-remat step (remat is numerics-neutral and
    the sharding constraint only relocates bytes)."""
    import optax

    from wfl_asr_tpu.models.tagger import init_tagger
    from wfl_asr_tpu.train.loop import make_train_step
    from wfl_asr_tpu.train.prodigy import prodigy

    arch = _tiny_arch()
    params, model_state = init_tagger(jax.random.PRNGKey(0), arch)
    tx = optax.inject_hyperparams(
        lambda learning_rate: prodigy(learning_rate=learning_rate))(
        learning_rate=1.0)

    rng = np.random.RandomState(4)
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
    step_rng = jax.random.PRNGKey(7)
    mesh = make_mesh()

    def run(use_fsdp, remat):
        host_copy = lambda tree: jax.tree_util.tree_map(
            lambda x: np.array(x), tree)
        p0 = host_copy(params)
        opt0 = tx.init(p0)
        if use_fsdp:
            p = shard_params_fsdp(p0, mesh, min_size=64)
            os_ = shard_params_fsdp(opt0, mesh, min_size=64)
            shardings = fsdp_shardings(p0, mesh, min_size=64)
        else:
            p = replicate(p0, mesh)
            os_ = replicate(opt0, mesh)
            shardings = None
        ms = replicate(host_copy(model_state), mesh)
        arrays = {k: jax.device_put(jnp.asarray(v),
                                    batch_sharding(mesh, np.ndim(v)))
                  for k, v in host.items()}
        step = make_train_step(arch, 0.1, 3.0, tx, mesh=mesh, remat=remat,
                               param_shardings=shardings)
        out = step(p, ms, os_, step_rng,
                   arrays["audio"], arrays["labels"], arrays["lang_ids"],
                   arrays["off_frames"], arrays["off_channels"],
                   arrays["off_fracs"], arrays["off_valid"],
                   max_label_len=t)
        _, _, _, metrics, _, _ = out
        return {k: float(v) for k, v in metrics.items()}

    m_ref = run(False, False)
    m_fs = run(True, True)
    for k in m_ref:
        np.testing.assert_allclose(m_fs[k], m_ref[k], rtol=1e-5,
                                   err_msg=k)

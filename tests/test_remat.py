"""Gradient checkpointing (``remat=True`` on the encoder layer loops).

No reference analogue (the torch fork never needed it — single-GPU bf16
at base scale); on TPU it is the standard deep-encoder memory lever:
each transformer layer under ``jax.checkpoint`` drops backward-pass
activation residency from O(layers) to O(1) layers for ~1/3 extra
encoder FLOPs. These tests pin the contract that remat is a pure
memory/FLOPs trade: numerics identical with it on or off — including
the dropout masks, via the pre-popped per-layer key order
(models/wavlm.py / models/whisper.py remat branches).
"""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp


def _wavlm_arch():
    import __graft_entry__ as graft
    wl = graft._flagship_arch(tiny=True).wavlm
    # nonzero dropouts so the key-order contract is actually exercised
    return dataclasses.replace(wl, hidden_dropout=0.1,
                               activation_dropout=0.1,
                               feat_proj_dropout=0.1)


def test_wavlm_remat_forward_identical_deterministic():
    from wfl_asr_tpu.models.wavlm import init_wavlm, wavlm_encode

    arch = _wavlm_arch()
    params = init_wavlm(jax.random.PRNGKey(0), arch)
    rng = np.random.RandomState(0)
    audio = jnp.asarray((rng.randn(2, 4000) * 0.3).astype(np.float32))

    ref = jax.jit(lambda p, a: wavlm_encode(p, arch, a))(params, audio)
    out = jax.jit(lambda p, a: wavlm_encode(p, arch, a, remat=True))(
        params, audio)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_wavlm_remat_dropout_masks_identical():
    """Train-mode forward (dropout active): the pre-popped key order must
    reproduce the inline loop's masks exactly."""
    from wfl_asr_tpu.models.wavlm import init_wavlm, wavlm_encode

    arch = _wavlm_arch()
    params = init_wavlm(jax.random.PRNGKey(0), arch)
    rng = np.random.RandomState(1)
    audio = jnp.asarray((rng.randn(2, 4000) * 0.3).astype(np.float32))
    key = jax.random.PRNGKey(7)

    def fwd(remat):
        return jax.jit(lambda p, a, k: wavlm_encode(
            p, arch, a, rng=k, deterministic=False, remat=remat))(
            params, audio, key)

    np.testing.assert_allclose(np.asarray(fwd(True)),
                               np.asarray(fwd(False)),
                               rtol=1e-6, atol=1e-6)


def test_wavlm_remat_grads_identical():
    from wfl_asr_tpu.models.wavlm import init_wavlm, wavlm_encode

    arch = _wavlm_arch()
    params = init_wavlm(jax.random.PRNGKey(0), arch)
    rng = np.random.RandomState(2)
    audio = jnp.asarray((rng.randn(2, 4000) * 0.3).astype(np.float32))
    key = jax.random.PRNGKey(3)

    def loss(p, remat):
        h = wavlm_encode(p, arch, audio, rng=key, deterministic=False,
                         remat=remat)
        return jnp.sum(h * h)

    g_ref = jax.jit(jax.grad(lambda p: loss(p, False)))(params)
    g_rm = jax.jit(jax.grad(lambda p: loss(p, True)))(params)
    flat_ref = jax.tree_util.tree_leaves(g_ref)
    flat_rm = jax.tree_util.tree_leaves(g_rm)
    assert len(flat_ref) == len(flat_rm)
    # jax.checkpoint recomputes the layer internals in the backward pass;
    # XLA may reassociate those replays differently, so grads agree to
    # float noise, not bitwise (measured max |Δ| ≈ 3e-6 on O(1e-3) grads).
    for a, b in zip(flat_rm, flat_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_whisper_remat_grads_identical():
    from wfl_asr_tpu.models.whisper import (WhisperArch,
                                            init_whisper_encoder,
                                            whisper_encode)

    arch = WhisperArch(num_mel_bins=8, d_model=16, num_layers=2,
                       num_heads=2, ffn_dim=32, max_source_positions=50,
                       dropout=0.1, activation_dropout=0.1)
    params = init_whisper_encoder(jax.random.PRNGKey(0), arch)
    rng = np.random.RandomState(4)
    feats = jnp.asarray(rng.randn(2, 8, 100).astype(np.float32))
    key = jax.random.PRNGKey(5)

    def loss(p, remat):
        h = whisper_encode(p, arch, feats, rng=key, deterministic=False,
                           remat=remat)
        return jnp.sum(h * h)

    g_ref = jax.jit(jax.grad(lambda p: loss(p, False)))(params)
    g_rm = jax.jit(jax.grad(lambda p: loss(p, True)))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_rm),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_train_step_remat_metrics_identical():
    """Full jitted train step (loss + Prodigy update) with training.remat
    on/off: metrics and updated params must agree."""
    import optax
    from wfl_asr_tpu.models.tagger import init_tagger
    from wfl_asr_tpu.train.loop import make_train_step
    from wfl_asr_tpu.train.prodigy import prodigy

    import __graft_entry__ as graft
    arch = graft._flagship_arch(tiny=True)
    arch = dataclasses.replace(arch, wavlm=_wavlm_arch())
    params, model_state = init_tagger(jax.random.PRNGKey(0), arch)

    tx = optax.inject_hyperparams(
        lambda learning_rate: prodigy(learning_rate=learning_rate))(
        learning_rate=1.0)

    rng = np.random.RandomState(5)
    b, s, t = 2, 4000, 12
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
    step_rng = jax.random.PRNGKey(11)

    def run(remat):
        p = jax.tree_util.tree_map(np.array, params)     # donation-safe
        ms = jax.tree_util.tree_map(np.array, model_state)
        os_ = tx.init(p)
        step = make_train_step(arch, 0.1, 3.0, tx, remat=remat)
        out = step(p, ms, os_, step_rng,
                   jnp.asarray(host["audio"]), jnp.asarray(host["labels"]),
                   jnp.asarray(host["lang_ids"]),
                   jnp.asarray(host["off_frames"]),
                   jnp.asarray(host["off_channels"]),
                   jnp.asarray(host["off_fracs"]),
                   jnp.asarray(host["off_valid"]), max_label_len=t)
        new_params, _, _, metrics, _, _ = out
        return ({k: float(v) for k, v in metrics.items()}, new_params)

    m_ref, p_ref = run(False)
    m_rm, p_rm = run(True)
    for k in m_ref:
        np.testing.assert_allclose(m_rm[k], m_ref[k], rtol=1e-5,
                                   err_msg=k)
    for a, b in zip(jax.tree_util.tree_leaves(p_rm),
                    jax.tree_util.tree_leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# training.remat: auto — OOM fallback (AutoRematStep)
# ---------------------------------------------------------------------------

def test_auto_remat_fallback_on_oom():
    """Non-remat build OOMs at compile → rebuilt once with remat and the
    call succeeds; the flip is sticky (later calls skip the failing build)."""
    from wfl_asr_tpu.train.loop import AutoRematStep

    calls = []

    def build(remat_flag):
        def step(x):
            calls.append(remat_flag)
            if not remat_flag:
                raise RuntimeError(
                    "RESOURCE_EXHAUSTED: Ran out of memory in memory "
                    "space hbm. Used 17.80G of 15.75G hbm.")
            return x + 1
        return step

    step = AutoRematStep(build)
    assert step(1) == 2
    assert step.remat
    assert calls == [False, True]
    assert step(5) == 6          # sticky: no retry dance on later calls
    assert calls == [False, True, True]


def test_auto_remat_relay_opaque_signature():
    """The axon relay hides the OOM cause behind an INTERNAL HTTP 500 —
    that signature retries the ORIGINAL build once (a transient relay
    blip must not flip the run), then falls back to remat if it repeats;
    anything else propagates untouched."""
    from wfl_asr_tpu.train.loop import (AutoRematStep, _looks_like_hbm_oom,
                                        _opaque_compile_error)

    opaque = ("INTERNAL: http://127.0.0.1:8083/remote_compile: HTTP 500: "
              "tpu_compile_helper subprocess exit code 1")
    assert _opaque_compile_error(RuntimeError(opaque))
    assert not _looks_like_hbm_oom(RuntimeError(opaque))
    assert not _looks_like_hbm_oom(ValueError("shapes do not match"))

    def build_bug(remat_flag):
        def step():
            raise ValueError("genuine bug, not memory")
        return step

    step = AutoRematStep(build_bug)
    try:
        step()
    except ValueError:
        pass
    else:
        raise AssertionError("non-OOM error must propagate")
    assert not step.remat

    # transient blip: first call raises opaque, the same-build retry
    # succeeds — no remat flip
    calls = []

    def build_blip(remat_flag):
        def stp(x):
            calls.append(remat_flag)
            if len(calls) == 1:
                raise RuntimeError(opaque)
            return x * 2
        return stp

    step = AutoRematStep(build_blip)
    assert step(3) == 6
    assert not step.remat and calls == [False, False]

    # persistent opaque failure: retry fails too -> flip to remat
    calls2, flips = [], []

    def build_persist(remat_flag):
        def stp(x):
            calls2.append(remat_flag)
            if not remat_flag:
                raise RuntimeError(opaque)
            return x * 2
        return stp

    step = AutoRematStep(build_persist, on_flip=lambda: flips.append(1))
    assert step(3) == 6
    assert step.remat and calls2 == [False, False, True] and flips == [1]


def test_auto_remat_donated_args_guard():
    """If the matched failure consumed donated buffers (execution-time,
    not compile-time), the retry would dereference deleted arrays — the
    original error must propagate instead."""
    from wfl_asr_tpu.train.loop import AutoRematStep

    x = jnp.ones((4,))

    @jax.jit
    def consume(a):
        return a + 1

    donated = jax.jit(lambda a: a * 2, donate_argnums=0)
    donated(x)          # x's buffer is now deleted
    assert x.is_deleted()

    def build(remat_flag):
        def stp(a):
            raise RuntimeError("Ran out of memory in memory space hbm")
        return stp

    step = AutoRematStep(build)
    try:
        step(x)
    except RuntimeError as e:
        assert "Ran out of memory" in str(e)
    else:
        raise AssertionError("must propagate when args are deleted")
    assert not step.remat


def test_auto_remat_rejected_multihost(tmp_path, monkeypatch):
    """remat: auto is a process-local decision — multi-host runs must
    reject it instead of risking desynchronized compiled programs."""
    import os
    import random as pyrandom
    import pytest
    from tests.test_preprocess import make_fixture_dataset, make_config
    from wfl_asr_tpu.preprocess import preprocess as run_preprocess
    from wfl_asr_tpu.train import loop as L

    rng = pyrandom.Random(22)
    data_dir = make_fixture_dataset(str(tmp_path), rng, langs=("en",),
                                    files_per_lang=4)
    save_dir = str(tmp_path / "save")
    config = make_config(data_dir, save_dir, [])
    config["data"]["num_val_files"] = 1
    config["model"].update({"encoder_type": "none", "enable_bilstm": False,
                            "num_conformer_layers": 0,
                            "enable_dilated_conv": False,
                            "lang_emb_dim": 8})
    config["training"].update({"batch_size": 2, "optimizer": "AdamW",
                               "max_steps": 1, "val_check_interval": 5,
                               "seed": 0, "remat": "auto",
                               "data_parallel": False})
    run_preprocess(data_dir, config)
    monkeypatch.setattr(L.jax, "process_count", lambda: 2)
    with pytest.raises(ValueError, match="single-host only"):
        L.train(os.path.join(save_dir, "config.yaml"))


def test_auto_remat_second_failure_propagates():
    """If the remat build ALSO fails, the error surfaces (no retry loop)."""
    from wfl_asr_tpu.train.loop import AutoRematStep

    def build(remat_flag):
        def step():
            raise RuntimeError("Ran out of memory in memory space hbm")
        return step

    step = AutoRematStep(build)
    try:
        step()
    except RuntimeError:
        pass
    else:
        raise AssertionError("second OOM must propagate")
    assert step.remat


def test_train_driver_remat_auto_config(tmp_path):
    """`training.remat: auto` drives a real (tiny, CPU) training run on
    the happy path — no OOM, so the non-remat step runs throughout."""
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
    config["model"].update({
        "encoder_type": "none", "enable_bilstm": False,
        "num_conformer_layers": 1, "conformer_heads": 2,
        "conformer_ff_expansion": 2, "conformer_kernel_size": 31,
        "lang_emb_dim": 8,
    })
    config["training"].update({
        "batch_size": 2, "optimizer": "AdamW", "learning_rate": 1e-3,
        "scheduler": "ConstantLR", "max_steps": 2,
        "val_check_interval": 2, "max_checkpoints": 1, "seed": 0,
        "remat": "auto", "data_parallel": False,
    })
    run_preprocess(data_dir, config)
    train(os.path.join(save_dir, "config.yaml"))
    assert os.path.exists(os.path.join(save_dir, "best_model.pt"))

"""Pallas kernels under shard_map on device meshes (VERDICT r2 Weak #1).

The flash-attention and fused-conv kernels are not GSPMD-partitionable as
bare custom calls; ``shard_wrap`` runs them per-shard over a
('data','model') mesh. These tests pin, on the virtual 8-device CPU
platform (kernels in interpret mode), that the sharded execution matches
the unsharded single-device kernels — forward AND gradients, including the
psum'd cotangents of replicated inputs (dBias) — and that the full
model/train paths keep their numerics when Pallas stays enabled on a mesh.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wfl_asr_tpu.parallel import make_mesh, replicate, shard_batch


# ---------------------------------------------------------------------------
# Kernel level
# ---------------------------------------------------------------------------

def test_flash_attention_shard_map_matches_unsharded():
    """Gated-bias flash kernel on a (4,2) mesh (batch on data, heads + the
    bias's head dim on model) == unsharded, incl. dQ/dBias/dGate."""
    from wfl_asr_tpu.ops.pallas.flash_attention import flash_attention

    mesh = make_mesh(model_parallel=2)
    B, H, T, D = 8, 4, 256, 32
    rng = np.random.RandomState(0)
    q, k, v = (jnp.asarray(rng.randn(B, H, T, D), jnp.float32)
               for _ in range(3))
    bias = jnp.asarray(rng.randn(H, T, T), jnp.float32) * 0.1
    gate = jnp.asarray(rng.randn(B, H, T), jnp.float32) * 0.1 + 1.0
    kvl = jnp.full((B,), T - 7, jnp.int32)

    ref = flash_attention(q, k, v, bias, gate, kvl,
                          block_q=128, block_k=128)
    out = flash_attention(q, k, v, bias, gate, kvl,
                          block_q=128, block_k=128, mesh=mesh)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    def loss(fn_mesh):
        def inner(q_, bias_, gate_):
            o = flash_attention(q_, k, v, bias_, gate_, kvl,
                                block_q=128, block_k=128, mesh=fn_mesh)
            return jnp.sum(o ** 2)
        return inner

    g_ref = jax.jit(jax.grad(loss(None), argnums=(0, 1, 2)))(q, bias, gate)
    g_dp = jax.jit(jax.grad(loss(mesh), argnums=(0, 1, 2)))(q, bias, gate)
    for a, b, name in zip(g_dp, g_ref, ("dq", "dbias", "dgate")):
        # dbias is psum'd across the data axis — summation order differs
        # from the single-device batch loop, so exact-zero isn't guaranteed
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5, err_msg=name)


def test_flash_trainable_shard_map_matches_unsharded():
    from wfl_asr_tpu.ops.pallas.flash_attention_bwd import \
        flash_attention_trainable

    mesh = make_mesh()  # pure DP (data=8)
    B, H, T, D = 8, 2, 256, 32
    rng = np.random.RandomState(1)
    q, k, v = (jnp.asarray(rng.randn(B, H, T, D), jnp.float32)
               for _ in range(3))
    kvl = jnp.full((B,), T - 3, jnp.int32)

    ref = flash_attention_trainable(q, k, v, kvl)
    out = flash_attention_trainable(q, k, v, kvl, mesh=mesh)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    def loss(mesh_):
        return lambda q_: jnp.sum(
            flash_attention_trainable(q_, k, v, kvl, mesh=mesh_) ** 2)

    g_ref = jax.jit(jax.grad(loss(None)))(q)
    g_dp = jax.jit(jax.grad(loss(mesh)))(q)
    np.testing.assert_allclose(np.asarray(g_dp), np.asarray(g_ref),
                               rtol=1e-6, atol=1e-6)


def test_fused_conv_chain_shard_map_matches_unsharded():
    from wfl_asr_tpu.ops.pallas.conv_fused import fused_conv_chain

    mesh = make_mesh()
    B, T, C = 8, 230, 32
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(B, T, C), jnp.float32)
    ws = [jnp.asarray(rng.randn(C, C, k) * 0.1, jnp.float32)
          for k in (3, 2)]
    mean = jnp.asarray(rng.randn(B, C), jnp.float32) * 0.1
    inv = jnp.asarray(1.0 + rng.rand(B, C), jnp.float32)
    scale = jnp.asarray(rng.randn(C), jnp.float32)
    bias = jnp.asarray(rng.randn(C), jnp.float32)

    for norm in (None, (mean, inv, scale, bias)):
        ref = fused_conv_chain(x, ws, input_norm=norm)
        out = fused_conv_chain(x, ws, input_norm=norm, mesh=mesh)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


# ---------------------------------------------------------------------------
# Model / train level
# ---------------------------------------------------------------------------

def _pallas_arch(freeze_encoder=False, fused_conv=False):
    import __graft_entry__ as graft
    arch = graft._flagship_arch(tiny=True)
    arch = dataclasses.replace(
        arch, use_flash_attention=True, freeze_encoder=freeze_encoder,
        wavlm=dataclasses.replace(arch.wavlm, use_flash_attention=True,
                                  use_fused_conv=fused_conv))
    return arch


def test_dp_inference_forward_pallas_matches_single_device():
    """Sharded bf16 inference forward with flash + fused conv enabled on
    the mesh == the ungated single-device Pallas path (the r2 gates in
    infer/pipeline and train/loop are gone)."""
    from wfl_asr_tpu.models.tagger import apply_tagger, init_tagger
    from wfl_asr_tpu.parallel import batch_sharding

    arch = _pallas_arch(fused_conv=True)
    params, state = init_tagger(jax.random.PRNGKey(0), arch)
    rng = np.random.RandomState(3)
    audio = jnp.asarray((rng.randn(8, 4000) * 0.3).astype(np.float32))
    lang_ids = jnp.asarray(rng.randint(0, 2, 8).astype(np.int32))

    def fwd(mesh_):
        @jax.jit
        def f(p, st, a, l):
            logits, offsets, _ = apply_tagger(
                p, st, arch, a, l, compute_dtype=jnp.bfloat16, mesh=mesh_)
            return logits, offsets
        return f

    ref_logits, ref_offsets = fwd(None)(params, state, audio, lang_ids)

    mesh = make_mesh()
    p_r, s_r = replicate(params, mesh), replicate(state, mesh)
    a_sh = jax.device_put(audio, batch_sharding(mesh, 2))
    l_sh = jax.device_put(lang_ids, batch_sharding(mesh, 1))
    dp_logits, dp_offsets = fwd(mesh)(p_r, s_r, a_sh, l_sh)

    # bf16 activations; GSPMD may reorder surrounding XLA float ops
    np.testing.assert_allclose(np.asarray(dp_logits, np.float32),
                               np.asarray(ref_logits, np.float32),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(dp_offsets, np.float32),
                               np.asarray(ref_offsets, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_dp_train_step_pallas_matches_single_device():
    """DP train step with the differentiable flash kernel (bf16 → flash at
    any length) equals the single-device step: dBias/dGate cotangents are
    psum'd across the data axis by shard_map's AD."""
    import optax
    from wfl_asr_tpu.models.tagger import init_tagger
    from wfl_asr_tpu.train.loop import make_train_step
    from wfl_asr_tpu.train.prodigy import prodigy

    arch = _pallas_arch()  # encoder NOT frozen → dBias/dGate exercised
    params, model_state = init_tagger(jax.random.PRNGKey(0), arch)

    def build(learning_rate):
        return prodigy(learning_rate=learning_rate)

    tx = optax.inject_hyperparams(build)(learning_rate=1.0)
    opt_state = tx.init(params)

    rng = np.random.RandomState(0)
    b, s, t = 8, 4000, 20
    batch = {
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

    def run(mesh_, p, ms, os_, arrays):
        step = make_train_step(arch, 0.1, 3.0, tx,
                               compute_dtype=jnp.bfloat16, mesh=mesh_)
        return step(p, ms, os_, step_rng,
                    arrays["audio"], arrays["labels"], arrays["lang_ids"],
                    arrays["off_frames"], arrays["off_channels"],
                    arrays["off_fracs"], arrays["off_valid"],
                    max_label_len=t)

    params_host = jax.device_get(params)
    state_host = jax.device_get(model_state)
    opt_host = jax.device_get(opt_state)

    single = run(None,
                 jax.tree_util.tree_map(jnp.asarray, params_host),
                 jax.tree_util.tree_map(jnp.asarray, state_host),
                 jax.tree_util.tree_map(jnp.asarray, opt_host),
                 {k: jnp.asarray(v) for k, v in batch.items()})
    single_params = jax.device_get(single[0])
    single_loss = float(single[3]["loss"])

    mesh = make_mesh()
    sharded = shard_batch(batch, mesh, pad_value_map={"labels": -100})
    with mesh:
        dp = run(mesh, replicate(params_host, mesh),
                 replicate(state_host, mesh), replicate(opt_host, mesh),
                 sharded)
    dp_params = jax.device_get(dp[0])
    dp_loss = float(dp[3]["loss"])

    assert dp_loss == pytest.approx(single_loss, rel=1e-3)
    # the encoder's rel-position embedding must have MOVED (dBias flowed)
    before = np.asarray(params_host["encoder"]["rel_attn_embed"]["w"])
    after_dp = np.asarray(dp_params["encoder"]["rel_attn_embed"]["w"])
    assert np.max(np.abs(after_dp - before)) > 0
    flat_s = jax.tree_util.tree_leaves(single_params)
    flat_d = jax.tree_util.tree_leaves(dp_params)
    for a, b_ in zip(flat_s, flat_d):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=5e-3, atol=5e-5)


def test_tp_forward_pallas_matches_replicated():
    """(data=4, model=2) mesh: flash kernels with heads (and the bias head
    dim) sharded on 'model' equal the unsharded Pallas forward."""
    from wfl_asr_tpu.models.tagger import apply_tagger, init_tagger
    from wfl_asr_tpu.parallel import batch_sharding, shard_params_tp

    arch = _pallas_arch()
    params, state = init_tagger(jax.random.PRNGKey(0), arch)
    rng = np.random.RandomState(5)
    audio = jnp.asarray((rng.randn(4, 4000) * 0.3).astype(np.float32))
    lang_ids = jnp.asarray(np.array([0, 1, 0, 1], np.int32))

    def fwd(mesh_):
        @jax.jit
        def f(p, st, a, l):
            logits, _, _ = apply_tagger(p, st, arch, a, l,
                                        compute_dtype=jnp.bfloat16,
                                        mesh=mesh_)
            return logits
        return f

    ref = fwd(None)(params, state, audio, lang_ids)

    mesh = make_mesh(model_parallel=2)
    p_tp = shard_params_tp(params, mesh)
    s_r = replicate(state, mesh)
    a_sh = jax.device_put(audio, batch_sharding(mesh, 2))
    l_sh = jax.device_put(lang_ids, batch_sharding(mesh, 1))
    tp = fwd(mesh)(p_tp, s_r, a_sh, l_sh)

    np.testing.assert_allclose(np.asarray(tp, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-2)

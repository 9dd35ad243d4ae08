"""Differentiable flash attention: forward and gradients vs the XLA
attention reference (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wfl_asr_tpu.models.layers import attention_core
from wfl_asr_tpu.ops.pallas.flash_attention import flash_attention
from wfl_asr_tpu.ops.pallas.flash_attention_bwd import flash_attention_trainable


@pytest.fixture(scope="module", autouse=True)
def f32_matmuls():
    with jax.default_matmul_precision("highest"):
        yield


def make_qkv(seed, b, h, t, d):
    rng = np.random.RandomState(seed)
    return tuple(jnp.asarray(rng.randn(b, h, t, d).astype(np.float32) * 0.5)
                 for _ in range(3))


@pytest.mark.parametrize("t", [64, 150])
def test_forward_matches(t):
    q, k, v = make_qkv(0, 2, 3, t, 64)
    ref = attention_core(q, k, v)
    out = flash_attention_trainable(q, k, v, None, 64, 128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_gradients_match():
    b, h, t, d = 2, 2, 130, 64
    q, k, v = make_qkv(1, b, h, t, d)
    g_target = jnp.asarray(np.random.RandomState(2)
                           .randn(b, h, t, d).astype(np.float32))

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention_trainable(q, k, v, None, 64, 128)
                       * g_target)

    def loss_ref(q, k, v):
        return jnp.sum(attention_core(q, k, v) * g_target)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_, name in zip(gf, gr, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=5e-5, rtol=1e-3,
                                   err_msg=f"d{name}")


def test_gradients_with_kv_len():
    b, h, t, d = 1, 2, 100, 32
    q, k, v = make_qkv(3, b, h, t, d)
    valid = 70
    mask = jnp.asarray((np.arange(t) < valid)[None])
    g_target = jnp.asarray(np.random.RandomState(4)
                           .randn(b, h, t, d).astype(np.float32))
    # only valid-query rows contribute, mirroring pipeline usage
    g_target = g_target * mask[:, None, :, None]

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention_trainable(q, k, v, valid, 64, 64)
                       * g_target)

    def loss_ref(q, k, v):
        return jnp.sum(attention_core(q, k, v, mask=mask) * g_target)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_, name in zip(gf, gr, "qkv"):
        np.testing.assert_allclose(np.asarray(a)[:, :, :valid],
                                   np.asarray(b_)[:, :, :valid],
                                   atol=5e-5, rtol=1e-3, err_msg=f"d{name}")


def test_gradients_finite_with_extreme_masked_keys():
    """Masked (padded) key columns with huge activations must not poison
    the gradients: the backward recomputation previously masked AFTER the
    exp (exp(s−lse)·0), so an overflowing exp on a masked column produced
    inf·0 = NaN (r3 review). Scores are now masked to NEG_INF first."""
    b, h, t, d = 1, 2, 128, 32
    q, k, v = make_qkv(7, b, h, t, d)
    valid = 64
    # padded-key region holds extreme values → masked-column s − lse ≫ 88
    k = k.at[:, :, valid:, :].set(400.0)
    v = v.at[:, :, valid:, :].set(5.0)
    mask = jnp.asarray((np.arange(t) < valid)[None])
    g_target = jnp.asarray(np.random.RandomState(8)
                           .randn(b, h, t, d).astype(np.float32))
    g_target = g_target * mask[:, None, :, None]

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention_trainable(q, k, v, valid, 64, 64)
                       * g_target)

    def loss_ref(q, k, v):
        return jnp.sum(attention_core(q, k, v, mask=mask) * g_target)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for a, name in zip(gf, "qkv"):
        assert np.isfinite(np.asarray(a)).all(), f"d{name} has NaN/inf"
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_, name in zip(gf, gr, "qkv"):
        np.testing.assert_allclose(np.asarray(a)[:, :, :valid],
                                   np.asarray(b_)[:, :, :valid],
                                   atol=5e-5, rtol=1e-3, err_msg=f"d{name}")


def test_forward_finite_with_zero_kv_len():
    """kv_len == 0 rows (empty utterance) clamp to attending key 0 only —
    finite, deterministic output instead of a garbage average of padded v
    rows (the all-masked online softmax degenerates to p≡1)."""
    q, k, v = make_qkv(9, 2, 2, 64, 32)
    kv = jnp.asarray([0, 40], jnp.int32)
    out = flash_attention_trainable(q, k, v, kv, 64, 64)
    assert np.isfinite(np.asarray(out)).all()
    # the clamped row attends exactly key 0 → its v row everywhere
    np.testing.assert_allclose(
        np.asarray(out)[0], np.broadcast_to(np.asarray(v)[0, :, :1], out.shape[1:]),
        atol=1e-5, rtol=1e-5)


# ---------------------------------------------------------------------------
# Gated-bias flash attention (WavLM path): fwd + all five gradients
# ---------------------------------------------------------------------------

def gated_xla(q, k, v, bias, gate, mask=None):
    """XLA reference: softmax(qk/sqrt(d) + gate[...,None]*bias[None]) v —
    exactly wavlm._gated_bias + attention_core."""
    gated = gate[..., None] * bias[None].astype(jnp.float32)
    return attention_core(q, k, v, bias=gated, mask=mask)


def make_gated(seed, b, h, t, d):
    rng = np.random.RandomState(seed)
    q, k, v = make_qkv(seed, b, h, t, d)
    bias = jnp.asarray(rng.randn(h, t, t).astype(np.float32) * 0.3)
    gate = jnp.asarray(rng.rand(b, h, t).astype(np.float32) * 2.0)
    return q, k, v, bias, gate


@pytest.mark.parametrize("t", [64, 130])
def test_gated_forward_matches(t):
    q, k, v, bias, gate = make_gated(5, 2, 3, t, 32)
    ref = gated_xla(q, k, v, bias, gate)
    out = flash_attention(q, k, v, bias=bias, gate=gate,
                          block_q=64, block_k=64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_gated_gradients_match():
    """dQ/dK/dV/dBias/dGate parity vs XLA attention (VERDICT r1 item 2)."""
    b, h, t, d = 2, 2, 130, 32
    q, k, v, bias, gate = make_gated(6, b, h, t, d)
    g_target = jnp.asarray(np.random.RandomState(7)
                           .randn(b, h, t, d).astype(np.float32))

    def loss_flash(q, k, v, bias, gate):
        return jnp.sum(flash_attention(q, k, v, bias=bias, gate=gate,
                                       block_q=64, block_k=64) * g_target)

    def loss_ref(q, k, v, bias, gate):
        return jnp.sum(gated_xla(q, k, v, bias, gate) * g_target)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2, 3, 4))(q, k, v, bias, gate)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(q, k, v, bias, gate)
    for a, b_, name in zip(gf, gr, ["q", "k", "v", "bias", "gate"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-4, rtol=1e-3,
                                   err_msg=f"d{name}")


def test_gated_gradients_finite_with_extreme_masked_keys():
    """Same NaN-poisoning regression as the no-bias kernel, for the gated
    WavLM path (both backward kernels recompute P from raw scores)."""
    b, h, t, d = 1, 2, 128, 32
    q, k, v, bias, gate = make_gated(10, b, h, t, d)
    valid = 64
    k = k.at[:, :, valid:, :].set(400.0)
    mask = jnp.asarray((np.arange(t) < valid)[None].repeat(b, axis=0))
    g_target = jnp.asarray(np.random.RandomState(11)
                           .randn(b, h, t, d).astype(np.float32))
    g_target = g_target * mask[:, None, :, None]

    def loss_flash(q, k, v, bias, gate):
        return jnp.sum(flash_attention(q, k, v, bias=bias, gate=gate,
                                       kv_len=valid, block_q=64, block_k=64)
                       * g_target)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2, 3, 4))(q, k, v, bias, gate)
    for a, name in zip(gf, ["q", "k", "v", "bias", "gate"]):
        assert np.isfinite(np.asarray(a)).all(), f"d{name} has NaN/inf"

    def loss_ref(q, k, v, bias, gate):
        return jnp.sum(gated_xla(q, k, v, bias, gate, mask=mask) * g_target)

    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(q, k, v, bias, gate)
    np.testing.assert_allclose(np.asarray(gf[0])[:, :, :valid],
                               np.asarray(gr[0])[:, :, :valid],
                               atol=1e-4, rtol=1e-3, err_msg="dq")
    np.testing.assert_allclose(np.asarray(gf[1])[:, :, :valid],
                               np.asarray(gr[1])[:, :, :valid],
                               atol=1e-4, rtol=1e-3, err_msg="dk")


def test_gated_gradients_with_kv_len():
    b, h, t, d = 2, 2, 100, 32
    q, k, v, bias, gate = make_gated(8, b, h, t, d)
    valid = 70
    mask = jnp.asarray((np.arange(t) < valid)[None].repeat(b, axis=0))
    g_target = jnp.asarray(np.random.RandomState(9)
                           .randn(b, h, t, d).astype(np.float32))
    g_target = g_target * mask[:, None, :, None]

    def loss_flash(q, k, v, bias, gate):
        return jnp.sum(flash_attention(q, k, v, bias=bias, gate=gate,
                                       kv_len=valid, block_q=64, block_k=64)
                       * g_target)

    def loss_ref(q, k, v, bias, gate):
        return jnp.sum(gated_xla(q, k, v, bias, gate, mask=mask) * g_target)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2, 3, 4))(q, k, v, bias, gate)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(q, k, v, bias, gate)
    # q/k/v/gate grads compared on valid rows; bias grads on the
    # valid×valid square (padded keys get exactly-zero grads in both).
    for a, b_, name in [(gf[0][:, :, :valid], gr[0][:, :, :valid], "q"),
                        (gf[1][:, :, :valid], gr[1][:, :, :valid], "k"),
                        (gf[2][:, :, :valid], gr[2][:, :, :valid], "v"),
                        (gf[3][:, :valid, :valid],
                         gr[3][:, :valid, :valid], "bias"),
                        (gf[4][:, :, :valid], gr[4][:, :, :valid], "gate")]:
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-4, rtol=1e-3, err_msg=f"d{name}")


def test_plain_bias_gradients_match():
    """bias without gate (has_bias=True, has_gate=False branch)."""
    b, h, t, d = 1, 2, 96, 32
    q, k, v, bias, _ = make_gated(10, b, h, t, d)
    g_target = jnp.asarray(np.random.RandomState(11)
                           .randn(b, h, t, d).astype(np.float32))

    def loss_flash(q, k, v, bias):
        return jnp.sum(flash_attention(q, k, v, bias=bias,
                                       block_q=32, block_k=32) * g_target)

    def loss_ref(q, k, v, bias):
        return jnp.sum(attention_core(q, k, v, bias=bias[None]) * g_target)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(q, k, v, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b_, name in zip(gf, gr, ["q", "k", "v", "bias"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-4, rtol=1e-3, err_msg=f"d{name}")


def test_wavlm_train_grads_flash_vs_xla(monkeypatch):
    """End-to-end WavLM encoder gradients with the flash kernel (custom
    VJP: dQ/dK/dV + dBias through the bucket gather onto rel_attn_embed +
    dGate onto gru_gate) vs the XLA attention path."""
    import dataclasses
    from wfl_asr_tpu.models import wavlm as wavlm_mod
    from wfl_asr_tpu.models.wavlm import WavLMArch, init_wavlm, wavlm_encode
    # The length gate would route this tiny f32 model back to XLA attention;
    # pin it so the Pallas kernel is actually exercised.
    monkeypatch.setattr(wavlm_mod, "FLASH_MIN_T", 0)

    arch = WavLMArch(hidden_size=64, num_layers=2, num_heads=4,
                     intermediate_size=128, conv_dim=(32, 32, 32),
                     conv_kernel=(10, 3, 3), conv_stride=(5, 2, 2),
                     num_conv_pos_embeddings=16,
                     num_conv_pos_embedding_groups=4,
                     num_buckets=40, max_distance=100)
    arch_flash = dataclasses.replace(arch, use_flash_attention=True)
    params = init_wavlm(jax.random.PRNGKey(0), arch)
    audio = jnp.asarray(np.random.RandomState(3)
                        .randn(2, 2000).astype(np.float32) * 0.3)

    def make_loss(a):
        def loss(p):
            return jnp.mean(wavlm_encode(p, a, audio) ** 2)
        return loss

    g_x = jax.grad(make_loss(arch))(params)
    g_f = jax.grad(make_loss(arch_flash))(params)
    flat_x = jax.tree_util.tree_leaves_with_path(g_x)
    flat_f = jax.tree_util.tree_leaves(g_f)
    assert len(flat_x) == len(flat_f)
    for (path, a), b_ in zip(flat_x, flat_f):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   atol=2e-4, rtol=2e-3,
                                   err_msg=jax.tree_util.keystr(path))

"""Differentiable flash attention: forward and gradients vs the XLA
attention reference (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wfl_asr_tpu.models.layers import attention_core
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

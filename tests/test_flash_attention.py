"""Flash attention kernel vs the XLA attention_core reference (interpret
mode on CPU; numeric check on TPU happens via the bench/infer paths)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wfl_asr_tpu.models.layers import attention_core
from wfl_asr_tpu.ops.pallas.flash_attention import flash_attention


def make_qkv(rng, b, h, t, d):
    return (jnp.asarray(rng.randn(b, h, t, d).astype(np.float32)),
            jnp.asarray(rng.randn(b, h, t, d).astype(np.float32)),
            jnp.asarray(rng.randn(b, h, t, d).astype(np.float32)))


@pytest.mark.parametrize("t", [64, 200, 513])
def test_plain_attention_matches(t):
    rng = np.random.RandomState(0)
    q, k, v = make_qkv(rng, 2, 3, t, 64)
    ref = attention_core(q, k, v)
    out = flash_attention(q, k, v, block_q=64, block_k=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_bias_and_gate_match():
    rng = np.random.RandomState(1)
    b, h, t, d = 2, 4, 150, 32
    q, k, v = make_qkv(rng, b, h, t, d)
    bias = jnp.asarray(rng.randn(h, t, t).astype(np.float32))
    gate = jnp.asarray((rng.rand(b, h, t).astype(np.float32)) + 0.5)

    gated = gate[:, :, :, None] * bias[None]
    ref = attention_core(q, k, v, bias=gated)
    out = flash_attention(q, k, v, bias=bias, gate=gate,
                          block_q=64, block_k=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_kv_len_masking_matches():
    rng = np.random.RandomState(2)
    b, h, t, d = 2, 2, 130, 64
    q, k, v = make_qkv(rng, b, h, t, d)
    valid = 97
    mask = jnp.asarray((np.arange(t) < valid)[None].repeat(b, 0))
    ref = attention_core(q, k, v, mask=mask)
    out = flash_attention(q, k, v, kv_len=valid, block_q=64, block_k=128)
    # only valid queries are meaningful (both sides garbage beyond kv_len
    # in different ways is fine — the pipeline slices them off)
    np.testing.assert_allclose(np.asarray(out)[:, :, :valid],
                               np.asarray(ref)[:, :, :valid],
                               atol=2e-5, rtol=1e-4)


def test_bf16_io():
    rng = np.random.RandomState(3)
    q, k, v = make_qkv(rng, 1, 2, 100, 64)
    q, k, v = (x.astype(jnp.bfloat16) for x in (q, k, v))
    ref = attention_core(q, k, v)
    out = flash_attention(q, k, v, block_q=64, block_k=128)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=3e-2, rtol=3e-2)

"""training.strict_attention_dropout: exact attention-probability dropout.

The reference trains through modules that drop attention *probabilities*:
HF WavLM's ``attention_dropout`` (reference model.py:72-81 via
from_pretrained) and ``nn.MultiheadAttention(dropout=...)`` in the
Conformer block (reference model.py:25). The default build substitutes a
post-projection dropout; the strict flag applies true prob-level dropout
during training — torch semantics: inverted dropout on the softmax
output, rows NOT renormalized. On the flash path it runs IN-KERNEL
(ops/pallas/dropout_mask.py, covered by tests/test_flash_dropout.py);
these tests pin the XLA-path semantics and the config/key contracts.
"""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp


def _arch(**kw):
    import __graft_entry__ as graft
    return dataclasses.replace(graft._flagship_arch(tiny=True).wavlm, **kw)


def test_attention_core_prob_dropout_semantics():
    """attention_core's prob dropout == manual softmax → inverted-dropout
    (same key, no renormalization) → weighted sum. Pins torch semantics."""
    from wfl_asr_tpu.models.layers import attention_core

    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(2, 2, 6, 4).astype(np.float32))
    k = jnp.asarray(rng.randn(2, 2, 6, 4).astype(np.float32))
    v = jnp.asarray(rng.randn(2, 2, 6, 4).astype(np.float32))
    key = jax.random.PRNGKey(3)
    rate = 0.4

    out = attention_core(q, k, v, dropout_rng=key, dropout_rate=rate)

    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(4)
    probs = jax.nn.softmax(logits, axis=-1)
    keep = jax.random.bernoulli(key, 1.0 - rate, probs.shape)
    probs = jnp.where(keep, probs / (1.0 - rate), 0.0)  # no renorm
    ref = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # and with no key it's plain attention
    base = attention_core(q, k, v)
    assert not np.allclose(np.asarray(out), np.asarray(base))


def test_strict_flag_off_and_inference_unchanged():
    """Flag on + deterministic == flag off (inference untouched); and with
    dropout rates zeroed, training outputs match too (the flag only
    reroutes when there is a rate to apply)."""
    from wfl_asr_tpu.models.wavlm import init_wavlm, wavlm_encode

    arch = _arch(attention_dropout=0.1)
    strict = dataclasses.replace(arch, strict_attention_dropout=True)
    params = init_wavlm(jax.random.PRNGKey(0), arch)
    rng = np.random.RandomState(1)
    audio = jnp.asarray((rng.randn(2, 4000) * 0.3).astype(np.float32))

    out = jax.jit(lambda p, a: wavlm_encode(p, strict, a))(params, audio)
    ref = jax.jit(lambda p, a: wavlm_encode(p, arch, a))(params, audio)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    z = dataclasses.replace(strict, attention_dropout=0.0)
    z0 = dataclasses.replace(arch, attention_dropout=0.0)
    key = jax.random.PRNGKey(2)
    out = jax.jit(lambda p, a, k: wavlm_encode(
        p, z, a, rng=k, deterministic=False))(params, audio, key)
    ref = jax.jit(lambda p, a, k: wavlm_encode(
        p, z0, a, rng=k, deterministic=False))(params, audio, key)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_strict_training_applies_prob_dropout():
    """Training with the flag: output is keyed (deterministic given the
    key), differs across keys, and differs from the substitute path."""
    from wfl_asr_tpu.models.wavlm import init_wavlm, wavlm_encode

    strict = _arch(attention_dropout=0.3, strict_attention_dropout=True)
    loose = dataclasses.replace(strict, strict_attention_dropout=False)
    params = init_wavlm(jax.random.PRNGKey(0), strict)
    rng = np.random.RandomState(2)
    audio = jnp.asarray((rng.randn(2, 4000) * 0.3).astype(np.float32))

    run = jax.jit(lambda p, a, k, s: wavlm_encode(
        p, strict if s else loose, a, rng=k, deterministic=False),
        static_argnames="s")
    out1 = run(params, audio, jax.random.PRNGKey(4), True)
    out2 = run(params, audio, jax.random.PRNGKey(4), True)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    out3 = run(params, audio, jax.random.PRNGKey(5), True)
    assert not np.allclose(np.asarray(out1), np.asarray(out3))
    sub = run(params, audio, jax.random.PRNGKey(4), False)
    assert not np.allclose(np.asarray(out1), np.asarray(sub))


def test_strict_remat_parity():
    """The derived fold_in key leaves the 3-pops-per-layer contract
    intact: remat on/off stays bit-comparable with the flag active."""
    from wfl_asr_tpu.models.wavlm import init_wavlm, wavlm_encode

    arch = _arch(attention_dropout=0.2, strict_attention_dropout=True)
    params = init_wavlm(jax.random.PRNGKey(0), arch)
    rng = np.random.RandomState(3)
    audio = jnp.asarray((rng.randn(2, 4000) * 0.3).astype(np.float32))
    key = jax.random.PRNGKey(7)

    out = jax.jit(lambda p, a, k: wavlm_encode(
        p, arch, a, rng=k, deterministic=False, remat=True))(
        params, audio, key)
    ref = jax.jit(lambda p, a, k: wavlm_encode(
        p, arch, a, rng=k, deterministic=False, remat=False))(
        params, audio, key)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_conformer_strict_replaces_substitute():
    """Conformer strict mode: prob dropout INSTEAD of the post-projection
    substitute (the reference block has no dropout after MHSA —
    model.py:41-42). rate=0 strict == rate=0 default, bit-exact."""
    from wfl_asr_tpu.models import heads as H
    from wfl_asr_tpu.models.layers import RngStream

    params, state = H.init_conformer_block(jax.random.PRNGKey(0), 16, 2, 2, 7)
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, 10, 16).astype(np.float32))

    def run(strict, rate, seed):
        return H.conformer_block(
            params, state, x, 2, 7, rate, RngStream(jax.random.PRNGKey(seed)),
            deterministic=False, train=True, strict_attn_dropout=strict)[0]

    np.testing.assert_array_equal(
        np.asarray(run(True, 0.0, 5)), np.asarray(run(False, 0.0, 5)))
    a = run(True, 0.4, 5)
    b = run(False, 0.4, 5)
    assert not np.allclose(np.asarray(a), np.asarray(b))
    # keyed determinism
    np.testing.assert_array_equal(np.asarray(a), np.asarray(run(True, 0.4, 5)))


def test_config_wires_strict_flag():
    from wfl_asr_tpu.config import Config
    from wfl_asr_tpu.models.tagger import TaggerArch

    raw = {"model": {"encoder_type": "wavlm",
                     "wavlm_model": "microsoft/wavlm-base",
                     "num_languages": 0},
           "training": {"strict_attention_dropout": True}}
    arch = TaggerArch.from_config(Config(raw), num_labels=5)
    assert arch.strict_attention_dropout
    assert arch.wavlm.strict_attention_dropout
    raw["training"]["strict_attention_dropout"] = False
    arch = TaggerArch.from_config(Config(raw), num_labels=5)
    assert not arch.strict_attention_dropout
    assert not arch.wavlm.strict_attention_dropout

"""In-kernel attention-probability dropout (flash kernels, interpret mode).

torch semantics — inverted dropout on the softmax output, rows NOT
renormalized (HF WavLM ``attention_dropout``, reference model.py:72-81;
``nn.MultiheadAttention(dropout=...)``, reference model.py:25) — with the
mask a pure hash of (seed, b, h, q, k) (ops/pallas/dropout_mask.py) so
the backward kernels regenerate it exactly at any tiling. These tests pin
forward and EVERY cotangent (dq/dk/dv, and dbias/dgate for the WavLM
kernel) against a plain-jnp oracle that uses the same hash mask, plus the
mask's statistics and the rate-0 no-op property.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wfl_asr_tpu.ops.pallas.dropout_mask import (
    attention_prob_dropout_reference, keep_mask_f32, uniform24)


def _rand(rng, *shape):
    return jnp.asarray(rng.randn(*shape).astype(np.float32) * 0.3)


def test_mask_statistics_and_determinism():
    q_idx = jnp.arange(512, dtype=jnp.int32)[:, None]
    k_idx = jnp.arange(512, dtype=jnp.int32)[None, :]
    rate = 0.3
    m = keep_mask_f32(jnp.int32(42), 1, 2, q_idx, k_idx, rate)
    keep_frac = float(jnp.mean((m > 0).astype(jnp.float32)))
    assert abs(keep_frac - (1 - rate)) < 0.01          # 512^2 samples
    # kept entries carry the inverted-dropout scale
    np.testing.assert_allclose(float(jnp.max(m)), 1 / (1 - rate), rtol=1e-6)
    # no row/column stripes (hash quality): every row/col near the rate
    row_frac = jnp.mean((m > 0).astype(jnp.float32), axis=1)
    col_frac = jnp.mean((m > 0).astype(jnp.float32), axis=0)
    assert float(jnp.max(jnp.abs(row_frac - (1 - rate)))) < 0.12
    assert float(jnp.max(jnp.abs(col_frac - (1 - rate)))) < 0.12
    # deterministic given the inputs; decorrelated across seed/b/h
    m2 = keep_mask_f32(jnp.int32(42), 1, 2, q_idx, k_idx, rate)
    np.testing.assert_array_equal(np.asarray(m), np.asarray(m2))
    for other in (keep_mask_f32(jnp.int32(43), 1, 2, q_idx, k_idx, rate),
                  keep_mask_f32(jnp.int32(42), 0, 2, q_idx, k_idx, rate),
                  keep_mask_f32(jnp.int32(42), 1, 3, q_idx, k_idx, rate)):
        agree = float(jnp.mean((np.asarray(m) > 0) == (np.asarray(other) > 0)))
        assert 0.5 < agree < 0.72   # ~ (1-r)^2 + r^2 = 0.58 if independent


def test_uniform24_range():
    u = uniform24(jnp.int32(7), 0, 0,
                  jnp.arange(64, dtype=jnp.int32)[:, None],
                  jnp.arange(64, dtype=jnp.int32)[None, :])
    assert int(jnp.min(u)) >= 0 and int(jnp.max(u)) < (1 << 24)


@pytest.mark.parametrize("rate", [0.2, 0.5])
def test_nobias_kernel_matches_oracle(rate):
    from wfl_asr_tpu.ops.pallas.flash_attention_bwd import (
        flash_attention_trainable)

    rng = np.random.RandomState(0)
    b, h, t, d = 2, 2, 160, 32
    q, k, v = (_rand(rng, b, h, t, d) for _ in range(3))
    kv_len = jnp.asarray([150, 97], jnp.int32)
    seed = jnp.int32(1234)

    def ref(q, k, v):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(d)
        mask = jnp.arange(t)[None, :] < kv_len[:, None]
        s = jnp.where(mask[:, None, None, :], s, -1e30)
        p = jax.nn.softmax(s, axis=-1)
        p = attention_prob_dropout_reference(p, seed, rate)
        return jnp.einsum("bhqk,bhkd->bhqd", p, v)

    out = flash_attention_trainable(q, k, v, kv_len,
                                    dropout_rate=rate, dropout_seed=seed)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref(q, k, v)),
                               atol=2e-6, rtol=1e-5)

    g = _rand(rng, b, h, t, d)
    gk = jax.grad(lambda *a: jnp.sum(flash_attention_trainable(
        *a, kv_len, dropout_rate=rate, dropout_seed=seed) * g),
        argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(lambda *a: jnp.sum(ref(*a) * g),
                  argnums=(0, 1, 2))(q, k, v)
    for a, r in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=2e-6, rtol=1e-5)


def test_nobias_kernel_rate_zero_is_noop():
    from wfl_asr_tpu.ops.pallas.flash_attention_bwd import (
        flash_attention_trainable)

    rng = np.random.RandomState(1)
    q, k, v = (_rand(rng, 1, 2, 96, 32) for _ in range(3))
    base = flash_attention_trainable(q, k, v)
    z = flash_attention_trainable(q, k, v, dropout_rate=0.0,
                                  dropout_seed=jnp.int32(5))
    np.testing.assert_array_equal(np.asarray(base), np.asarray(z))
    with pytest.raises(ValueError, match="requires dropout_seed"):
        flash_attention_trainable(q, k, v, dropout_rate=0.1)


def test_wavlm_kernel_matches_oracle_incl_dbias_dgate():
    from wfl_asr_tpu.ops.pallas.flash_attention import flash_attention

    rng = np.random.RandomState(2)
    b, h, t, d = 2, 2, 96, 32
    q, k, v = (_rand(rng, b, h, t, d) for _ in range(3))
    bias = jnp.asarray(rng.randn(h, t, t).astype(np.float32) * 0.2)
    gate = jnp.asarray((rng.rand(b, h, t) * 0.5 + 0.5).astype(np.float32))
    kv_len = jnp.asarray([90, 61], jnp.int32)
    seed, rate = jnp.int32(77), 0.25

    def ref(q, k, v, bias, gate):
        s = (jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(d)
             + gate[..., None] * bias[None])
        mask = jnp.arange(t)[None, :] < kv_len[:, None]
        s = jnp.where(mask[:, None, None, :], s, -1e30)
        p = jax.nn.softmax(s, axis=-1)
        p = attention_prob_dropout_reference(p, seed, rate)
        return jnp.einsum("bhqk,bhkd->bhqd", p, v)

    out = flash_attention(q, k, v, bias, gate, kv_len,
                          dropout_rate=rate, dropout_seed=seed)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(ref(q, k, v, bias, gate)),
                               atol=2e-6, rtol=1e-5)

    g = _rand(rng, b, h, t, d)
    gk = jax.grad(lambda *a: jnp.sum(flash_attention(
        *a, kv_len, dropout_rate=rate, dropout_seed=seed) * g),
        argnums=(0, 1, 2, 3, 4))(q, k, v, bias, gate)
    gr = jax.grad(lambda *a: jnp.sum(ref(*a) * g),
                  argnums=(0, 1, 2, 3, 4))(q, k, v, bias, gate)
    for name, a, r in zip("q k v bias gate".split(), gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=2e-6, rtol=1e-5,
                                   err_msg=f"d{name}")


@pytest.mark.parametrize("case", [
    # (b, h, t, d, rate, dtype) — t values straddle the 128-lane granule
    # and the default block bounds so several tilings are exercised
    (1, 1, 64, 32, 0.1, np.float32),
    (3, 2, 200, 64, 0.5, np.float32),
    (2, 4, 384, 32, 0.25, np.float32),
    (2, 2, 137, 64, 0.3, np.float32),
    (2, 2, 160, 64, 0.2, "bfloat16"),
])
def test_dropout_fuzz_shapes_and_tilings(case):
    """Kernel == oracle across shapes, rates, ragged kv_len, and dtypes
    (fwd + dq/dk/dv) for the no-bias kernel; random per-case seeds."""
    from wfl_asr_tpu.ops.pallas.flash_attention_bwd import (
        flash_attention_trainable)

    b, h, t, d, rate, dtype = case
    dtype = jnp.bfloat16 if dtype == "bfloat16" else dtype
    rng = np.random.RandomState(hash(case[:4]) % (2**31))
    q, k, v = (jnp.asarray(rng.randn(b, h, t, d).astype(np.float32) * 0.3,
                           dtype) for _ in range(3))
    kv_len = jnp.asarray(rng.randint(max(1, t // 2), t + 1, size=(b,)),
                         jnp.int32)
    seed = jnp.int32(rng.randint(-2**31, 2**31 - 1))
    tol = dict(atol=2e-2, rtol=2e-2) if dtype == jnp.bfloat16 else \
        dict(atol=2e-6, rtol=1e-5)

    def ref(q, k, v):
        qf, kf, vf = (a.astype(jnp.float32) for a in (q, k, v))
        s = jnp.einsum("bhqd,bhkd->bhqk", qf, kf) / np.sqrt(d)
        mask = jnp.arange(t)[None, :] < kv_len[:, None]
        s = jnp.where(mask[:, None, None, :], s, -1e30)
        p = jax.nn.softmax(s, axis=-1)
        p = attention_prob_dropout_reference(p, seed, rate)
        # the kernel's PV matmul runs at the value dtype
        return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype).astype(
            jnp.float32), vf).astype(q.dtype)

    out = flash_attention_trainable(q, k, v, kv_len,
                                    dropout_rate=rate, dropout_seed=seed)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref(q, k, v), np.float32), **tol)

    g = jnp.asarray(rng.randn(b, h, t, d).astype(np.float32) * 0.3, dtype)
    gk = jax.grad(lambda *a: jnp.sum((flash_attention_trainable(
        *a, kv_len, dropout_rate=rate, dropout_seed=seed)
        * g).astype(jnp.float32)), argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(lambda *a: jnp.sum((ref(*a) * g).astype(jnp.float32)),
                  argnums=(0, 1, 2))(q, k, v)
    for name, a, r in zip("qkv", gk, gr):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(r, np.float32), **tol,
                                   err_msg=f"d{name}")


def test_strict_flash_remat_grad_parity(monkeypatch):
    """In-kernel dropout composes with jax.checkpoint: remat REPLAYS the
    forward kernel, and the hash mask (seed is data, not a side effect)
    makes the replay bit-stable — grads match remat off, flash path on."""
    import dataclasses
    import __graft_entry__ as graft
    from wfl_asr_tpu.models import wavlm as wavlm_mod
    from wfl_asr_tpu.models.wavlm import init_wavlm, wavlm_encode

    monkeypatch.setattr(wavlm_mod, "FLASH_MIN_T", 1)
    wl = graft._flagship_arch(tiny=True).wavlm
    arch = dataclasses.replace(wl, attention_dropout=0.3,
                               strict_attention_dropout=True,
                               use_flash_attention=True)
    params = init_wavlm(jax.random.PRNGKey(0), arch)
    rng = np.random.RandomState(8)
    audio = jnp.asarray((rng.randn(2, 4000) * 0.3).astype(np.float32))
    key = jax.random.PRNGKey(11)

    def loss(p, remat):
        return jnp.sum(wavlm_encode(p, arch, audio, rng=key,
                                    deterministic=False, remat=remat) ** 2)

    g_on = jax.jit(jax.grad(lambda p: loss(p, True)))(params)
    g_off = jax.jit(jax.grad(lambda p: loss(p, False)))(params)
    # jax.checkpoint restructures the backward graph, so tiny float
    # reassociation deltas (measured ≤3e-6 abs) are expected — the mask
    # itself is bit-stable (a replayed-mask mismatch would produce O(1)
    # errors: a dropped-vs-kept element flips the whole contribution).
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5), g_on, g_off)


def test_mesh_masks_bit_identical_to_unsharded():
    """Dropout on a mesh: shard_map kernels see shard-LOCAL b/h indices;
    the wrapper offsets the seed by the shard origin through the hash's
    linear b/h pre-mix, so the masks — and hence outputs and grads — are
    BIT-identical to the unsharded call (both data and model axes)."""
    from wfl_asr_tpu.ops.pallas.flash_attention import flash_attention
    from wfl_asr_tpu.ops.pallas.flash_attention_bwd import (
        flash_attention_trainable)
    from wfl_asr_tpu.parallel import make_mesh

    rng = np.random.RandomState(6)
    b, h, t, d = 8, 4, 128, 32
    q, k, v = (_rand(rng, b, h, t, d) for _ in range(3))
    kv_len = jnp.asarray([t - (i % 3) for i in range(b)], jnp.int32)
    seed, rate = jnp.int32(99), 0.35

    mesh = make_mesh(model_parallel=2)          # (data=4, model=2)
    for fn, args in ((flash_attention_trainable, (q, k, v, kv_len)),
                     (flash_attention,
                      (q, k, v,
                       jnp.asarray(rng.randn(h, t, t), jnp.float32) * 0.2,
                       jnp.asarray(rng.rand(b, h, t), jnp.float32) + 0.5,
                       kv_len))):
        ref = fn(*args, dropout_rate=rate, dropout_seed=seed)
        out = fn(*args, mesh=mesh, dropout_rate=rate, dropout_seed=seed)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
        # grads ride the same regenerated masks: dq must also bit-match
        gref = jax.grad(lambda q_: jnp.sum(fn(
            q_, *args[1:], dropout_rate=rate, dropout_seed=seed)))(q)
        gdp = jax.grad(lambda q_: jnp.sum(fn(
            q_, *args[1:], mesh=mesh, dropout_rate=rate,
            dropout_seed=seed)))(q)
        np.testing.assert_allclose(np.asarray(gdp), np.asarray(gref),
                                   rtol=1e-6, atol=1e-7)


def test_strict_flash_conformer_block_path(monkeypatch):
    """conformer_block with strict dropout + flash drives the in-kernel
    dropout (heads.py drop-dict wiring): the rate reaches the kernel,
    output is keyed-deterministic and differs from the non-strict path."""
    import importlib
    from wfl_asr_tpu.models import heads as H
    from wfl_asr_tpu.models import wavlm as wavlm_mod
    from wfl_asr_tpu.models.layers import RngStream

    monkeypatch.setattr(wavlm_mod, "FLASH_MIN_T", 1)
    fb_mod = importlib.import_module(
        "wfl_asr_tpu.ops.pallas.flash_attention_bwd")
    calls = []
    real = fb_mod.flash_attention_trainable

    def recording(*a, **kw):
        calls.append(kw.get("dropout_rate", 0.0))
        return real(*a, **kw)

    monkeypatch.setattr(fb_mod, "flash_attention_trainable", recording)

    params, state = H.init_conformer_block(jax.random.PRNGKey(0), 16, 2, 2, 7)
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, 16, 16).astype(np.float32))

    def run(strict, rate, seed):
        return H.conformer_block(
            params, state, x, 2, 7, rate, RngStream(jax.random.PRNGKey(seed)),
            deterministic=False, train=True, use_flash=True,
            strict_attn_dropout=strict)[0]

    a = run(True, 0.4, 5)
    assert calls and calls[-1] == 0.4      # the kernel saw the rate
    np.testing.assert_array_equal(np.asarray(a), np.asarray(run(True, 0.4, 5)))
    assert not np.allclose(np.asarray(a), np.asarray(run(True, 0.4, 6)))
    assert not np.allclose(np.asarray(a), np.asarray(run(False, 0.4, 5)))


def test_strict_flash_wavlm_encode_keyed_and_memory_path(monkeypatch):
    """wavlm_encode with strict dropout + flash: keyed-deterministic,
    seed-sensitive, and inference (deterministic) is unaffected. The
    fixture is short-T f32, which would route to the XLA branch — pin
    FLASH_MIN_T down and record the kernel call so the test provably
    drives the in-kernel dropout wiring (_attend's drop dict)."""
    import dataclasses
    import __graft_entry__ as graft
    from wfl_asr_tpu.models import wavlm as wavlm_mod
    from wfl_asr_tpu.models.wavlm import init_wavlm, wavlm_encode
    import importlib
    # the ops.pallas package re-exports the function under the submodule's
    # name, so plain `import ... as` grabs the function — go via importlib
    fa_mod = importlib.import_module(
        "wfl_asr_tpu.ops.pallas.flash_attention")

    monkeypatch.setattr(wavlm_mod, "FLASH_MIN_T", 1)
    calls = []
    real_flash = fa_mod.flash_attention

    def recording_flash(*a, **kw):
        calls.append(kw.get("dropout_rate", 0.0))
        return real_flash(*a, **kw)

    monkeypatch.setattr(fa_mod, "flash_attention", recording_flash)

    wl = graft._flagship_arch(tiny=True).wavlm
    arch = dataclasses.replace(wl, attention_dropout=0.3,
                               strict_attention_dropout=True,
                               use_flash_attention=True)
    params = init_wavlm(jax.random.PRNGKey(0), arch)
    rng = np.random.RandomState(3)
    audio = jnp.asarray((rng.randn(2, 4000) * 0.3).astype(np.float32))

    run = jax.jit(lambda p, a, k: wavlm_encode(p, arch, a, rng=k,
                                               deterministic=False))
    o1 = run(params, audio, jax.random.PRNGKey(4))
    # every layer traced through the flash kernel with the dropout rate
    assert calls and all(r == 0.3 for r in calls)
    o2 = run(params, audio, jax.random.PRNGKey(4))
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    o3 = run(params, audio, jax.random.PRNGKey(5))
    assert not np.allclose(np.asarray(o1), np.asarray(o3))
    # inference identical with/without the strict flag
    plain = dataclasses.replace(arch, strict_attention_dropout=False)
    a = jax.jit(lambda p, x: wavlm_encode(p, arch, x))(params, audio)
    b = jax.jit(lambda p, x: wavlm_encode(p, plain, x))(params, audio)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

"""LayerDrop (WavLMArch.layerdrop / WhisperArch.layerdrop).

The reference fine-tunes HF encoders with the hub configs' LayerDrop
active (model.py:76-81 only disables SpecAugment); this implementation
matches HF's whole-batch skip semantics with a where-select (static
graph: the layer is computed and discarded — same regularizer, no FLOP
saving). Inference (deterministic) is untouched.
"""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp


def _arch(layerdrop):
    import __graft_entry__ as graft
    return dataclasses.replace(graft._flagship_arch(tiny=True).wavlm,
                               layerdrop=layerdrop)


def test_layerdrop_one_skips_every_layer():
    """layerdrop=1.0: every transformer layer is skipped, so train-mode
    output == the same forward on a 0-layer encoder."""
    from wfl_asr_tpu.models.wavlm import init_wavlm, wavlm_encode

    arch = _arch(1.0)
    params = init_wavlm(jax.random.PRNGKey(0), arch)
    rng = np.random.RandomState(0)
    audio = jnp.asarray((rng.randn(2, 4000) * 0.3).astype(np.float32))
    key = jax.random.PRNGKey(5)

    out = jax.jit(lambda p, a, k: wavlm_encode(
        p, arch, a, rng=k, deterministic=False))(params, audio, key)

    # same params/rates with the layer list emptied: identical pre-loop
    # pipeline (feature encoder, projection + its dropout, pos-conv,
    # encoder LN, hidden dropout) — must match exactly since the loop's
    # key pops never reach the pre-loop ones.
    arch0 = dataclasses.replace(arch, num_layers=0)
    p0 = dict(params)
    p0["layers"] = []
    ref = jax.jit(lambda p, a, k: wavlm_encode(
        p, arch0, a, rng=k, deterministic=False))(p0, audio, key)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_layerdrop_stochastic_and_keyed():
    """layerdrop=0.5: deterministic given the key, different across keys,
    different from the no-layerdrop run."""
    from wfl_asr_tpu.models.wavlm import init_wavlm, wavlm_encode

    arch = _arch(0.5)
    params = init_wavlm(jax.random.PRNGKey(0), arch)
    rng = np.random.RandomState(1)
    audio = jnp.asarray((rng.randn(2, 4000) * 0.3).astype(np.float32))

    run = jax.jit(lambda p, a, k: wavlm_encode(
        p, arch, a, rng=k, deterministic=False))
    out1 = run(params, audio, jax.random.PRNGKey(6))
    out2 = run(params, audio, jax.random.PRNGKey(6))
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    # keys differ -> (almost surely) different skip patterns
    outs = [np.asarray(run(params, audio, jax.random.PRNGKey(k)))
            for k in (10, 11, 12, 13)]
    assert any(not np.allclose(outs[0], o) for o in outs[1:])


def test_layerdrop_inactive_at_inference():
    from wfl_asr_tpu.models.wavlm import init_wavlm, wavlm_encode

    arch = _arch(1.0)
    params = init_wavlm(jax.random.PRNGKey(0), arch)
    rng = np.random.RandomState(2)
    audio = jnp.asarray((rng.randn(2, 4000) * 0.3).astype(np.float32))

    out = jax.jit(lambda p, a: wavlm_encode(p, arch, a))(params, audio)
    ref = jax.jit(lambda p, a: wavlm_encode(p, _arch(0.0), a))(
        params, audio)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_layerdrop_remat_parity():
    """remat on/off stays bit-identical with LayerDrop active (the skip
    key pops before the layer's pre-popped keys in both paths)."""
    from wfl_asr_tpu.models.wavlm import init_wavlm, wavlm_encode

    arch = _arch(0.5)
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


def test_layerdrop_whisper():
    from wfl_asr_tpu.models.whisper import (WhisperArch,
                                            init_whisper_encoder,
                                            whisper_encode)

    arch = WhisperArch(num_mel_bins=8, d_model=16, num_layers=2,
                       num_heads=2, ffn_dim=32, max_source_positions=50,
                       layerdrop=1.0)
    params = init_whisper_encoder(jax.random.PRNGKey(0), arch)
    rng = np.random.RandomState(4)
    feats = jnp.asarray(rng.randn(2, 8, 100).astype(np.float32))
    key = jax.random.PRNGKey(8)

    out = jax.jit(lambda p, f, k: whisper_encode(
        p, arch, f, rng=k, deterministic=False))(params, feats, key)

    arch0 = dataclasses.replace(arch, num_layers=0)
    p0 = dict(params)
    p0["layers"] = []
    ref = jax.jit(lambda p, f, k: whisper_encode(
        p, arch0, f, rng=k, deterministic=False))(p0, feats, key)
    # XLA fuses the where-selected graph differently -> float noise only
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_layerdrop_under_pipeline_parallel():
    """PP + LayerDrop: whole-batch per-layer skip decisions (drawn from
    gpipe's layer_key, so every microbatch of a layer agrees — HF
    semantics); layerdrop=1.0 skips everything."""
    from wfl_asr_tpu.models.wavlm import init_wavlm, wavlm_encode
    from wfl_asr_tpu.parallel import pp

    arch = dataclasses.replace(_arch(1.0), num_layers=4)
    params = init_wavlm(jax.random.PRNGKey(0), arch)
    mesh = pp.make_pp_mesh(4)
    pp_params = dict(params)
    pp_params["layers"] = pp.place_stacked(
        pp.stack_layers(params["layers"]), mesh)
    rng = np.random.RandomState(5)
    audio = jnp.asarray((rng.randn(8, 4000) * 0.3).astype(np.float32))
    key = jax.random.PRNGKey(9)

    out = jax.jit(lambda p, a, k: wavlm_encode(
        p, arch, a, rng=k, deterministic=False, mesh=mesh))(
        pp_params, audio, key)

    arch0 = dataclasses.replace(arch, num_layers=0)
    p0 = dict(params)
    p0["layers"] = []
    # 0-layer run pops one key fewer (the PP base key); layerdrop=1.0
    # makes the layer stack an exact identity on x, so compare against
    # the same pre-loop pipeline traced with the identical pop count by
    # popping the unused key explicitly.
    from wfl_asr_tpu.models.layers import RngStream

    def ref_fn(p, a, k):
        # mirror wavlm_encode's pre-loop pops then drop the PP base key
        return wavlm_encode(p, arch0, a, rng=k, deterministic=False)

    ref = jax.jit(ref_fn)(p0, audio, key)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)

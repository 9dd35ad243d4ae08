"""Multi-layer fused conv-chain kernel vs the XLA conv+GELU chain
(interpret mode on CPU), and its wiring into the WavLM feature encoder."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wfl_asr_tpu.models.layers import conv1d
from wfl_asr_tpu.ops.pallas.conv_fused import fused_conv_chain


def xla_chain(x, ws):
    y = jnp.swapaxes(x, 1, 2)
    for w in ws:
        y = conv1d({"w": w}, y, stride=2, padding="VALID")
        y = jax.nn.gelu(y, approximate=False)
    return jnp.swapaxes(y, 1, 2)


def make_chain(seed, c, ks):
    rng = np.random.RandomState(seed)
    return [jnp.asarray(rng.randn(c, c, k).astype(np.float32)
                        * (0.5 / np.sqrt(c * k))) for k in ks]


@pytest.mark.parametrize("ks,t,tile", [
    ((3, 3, 3), 2100, 64),        # WavLM layers 1-3 shape-alike
    ((3, 2, 2), 1500, 32),        # WavLM layers 4-6 shape-alike
    ((3, 3, 3, 3, 2, 2), 4200, 16),   # full base tail in one kernel
    ((2,), 300, 64),
])
def test_fused_chain_matches_xla(ks, t, tile):
    rng = np.random.RandomState(sum(ks) + t)
    b, c = 2, 64
    x = jnp.asarray((rng.randn(b, t, c) * 0.4).astype(np.float32))
    ws = make_chain(1, c, ks)
    ref = xla_chain(x, ws)
    out = fused_conv_chain(x, ws, tile_out=tile)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("b,bb", [
    (3, 2),   # bb does not divide b → falls back to nb=1
    (4, 4),   # whole batch per invocation
    (6, 4),   # largest divisor ≤ bb → nb=3
])
def test_fused_chain_batch_block(b, bb):
    """batch_block packs several batch rows per grid invocation (amortizes
    the per-invocation overhead); numerics must not depend on the block."""
    rng = np.random.RandomState(b * 10 + bb)
    t, c = 1100, 64
    x = jnp.asarray((rng.randn(b, t, c) * 0.4).astype(np.float32))
    ws = make_chain(2, c, (3, 2, 2))
    ref = xla_chain(x, ws)
    out = fused_conv_chain(x, ws, tile_out=32, batch_block=bb)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("b,bb,has_norm", [
    (4, 2, False),
    (4, 4, True),
])
def test_fused_chain_packed_matches_xla(monkeypatch, b, bb, has_norm):
    """WFL_CONV_PACKED: batch rows fused into single taller matmuls per
    invocation (the grid-packing dispatch-floor variant) — numerics must
    match the per-row kernel / XLA chain exactly, including the fused
    input-norm+GELU path."""
    from wfl_asr_tpu.ops.pallas import conv_fused
    monkeypatch.setattr(conv_fused, "PACKED", True)
    rng = np.random.RandomState(100 * b + bb + has_norm)
    t, c = 1096 + b + bb + has_norm, 64   # unique shapes: fresh jit trace
    x = jnp.asarray((rng.randn(b, t, c) * 0.4).astype(np.float32))
    ws = make_chain(5, c, (3, 2, 2))
    if has_norm:
        mean = jnp.asarray(rng.randn(b, c).astype(np.float32) * 0.1)
        inv = jnp.asarray((1.0 + rng.rand(b, c)).astype(np.float32))
        scale = jnp.asarray(rng.randn(c).astype(np.float32))
        bias = jnp.asarray(rng.randn(c).astype(np.float32) * 0.1)
        norm = (mean, inv, scale, bias)
        xin = jax.nn.gelu((x - mean[:, None]) * inv[:, None] * scale + bias,
                          approximate=False)
        ref = xla_chain(xin, ws)
    else:
        norm = None
        ref = xla_chain(x, ws)
    out = fused_conv_chain(x, ws, tile_out=32, input_norm=norm,
                           batch_block=bb)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_fused_chain_bf16():
    rng = np.random.RandomState(3)
    b, t, c = 1, 1100, 64
    x = jnp.asarray((rng.randn(b, t, c) * 0.4).astype(np.float32))
    ws = make_chain(4, c, (3, 3, 2))
    ref = xla_chain(x.astype(jnp.bfloat16), ws)
    out = fused_conv_chain(x.astype(jnp.bfloat16), ws, tile_out=32)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=5e-2, rtol=5e-2)


def test_feature_encoder_fused_flag_matches():
    """use_fused_conv routes layers 1+ through the fused kernel with
    numerics matching the XLA path (the flag inference sessions set on
    TPU)."""
    from wfl_asr_tpu.models.wavlm import (WavLMArch, init_wavlm,
                                          feature_encoder, _fused_tail_start)
    arch = WavLMArch(hidden_size=64, num_layers=1, num_heads=4,
                     intermediate_size=128, conv_dim=(32, 32, 32, 32),
                     conv_kernel=(10, 3, 3, 2), conv_stride=(5, 2, 2, 2),
                     num_conv_pos_embeddings=16,
                     num_conv_pos_embedding_groups=4,
                     num_buckets=40, max_distance=100)
    assert _fused_tail_start(arch) == 1
    arch_fused = dataclasses.replace(arch, use_fused_conv=True)
    params = init_wavlm(jax.random.PRNGKey(0), arch)
    audio = jnp.asarray(np.random.RandomState(5)
                        .randn(2, 6000).astype(np.float32) * 0.3)
    ref = feature_encoder(params, arch, audio)
    out = feature_encoder(params, arch_fused, audio)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_fused_tail_start_gating():
    from wfl_asr_tpu.models.wavlm import WavLMArch, _fused_tail_start
    base = WavLMArch()
    assert _fused_tail_start(base) == 1          # layers 1-6 fused
    large = WavLMArch(conv_bias=True, feat_extract_norm="layer")
    assert _fused_tail_start(large) == 7         # per-layer LN: all XLA


def test_feature_encoder_fused_masked_matches_exact():
    """Bucketed (padded + sample_mask) fused path reproduces an exact-length
    run on valid frames — the masked-GroupNorm invariant, now through the
    channels-last layer-0 + fused-chain route."""
    from wfl_asr_tpu.models.wavlm import (WavLMArch, init_wavlm,
                                          feature_encoder)
    arch = dataclasses.replace(
        WavLMArch(hidden_size=64, num_layers=1, num_heads=4,
                  intermediate_size=128, conv_dim=(32, 32, 32, 32),
                  conv_kernel=(10, 3, 3, 2), conv_stride=(5, 2, 2, 2),
                  num_conv_pos_embeddings=16,
                  num_conv_pos_embedding_groups=4,
                  num_buckets=40, max_distance=100),
        use_fused_conv=True)
    params = init_wavlm(jax.random.PRNGKey(1), arch)
    rng = np.random.RandomState(7)
    full = 6000
    valid = 4500
    audio = np.zeros((2, full), np.float32)
    audio[0] = rng.randn(full) * 0.3
    audio[1, :valid] = rng.randn(valid) * 0.3
    mask = np.zeros((2, full), bool)
    mask[0] = True
    mask[1, :valid] = True

    bucketed = feature_encoder(params, arch, jnp.asarray(audio),
                               sample_mask=jnp.asarray(mask))
    exact = feature_encoder(params, arch, jnp.asarray(audio[1:2, :valid]))
    tv = arch.feature_lengths(valid)
    np.testing.assert_allclose(np.asarray(bucketed[1, :tv]),
                               np.asarray(exact[0]),
                               atol=2e-5, rtol=1e-4)


def test_frozen_encoder_train_step_with_fused_conv():
    """freeze_encoder training may run the forward-only fused conv chains
    (stop_gradient keeps the backward away from the Pallas kernel)."""
    import optax
    import __graft_entry__ as graft
    from wfl_asr_tpu.models.tagger import init_tagger
    from wfl_asr_tpu.train.loop import make_train_step
    from wfl_asr_tpu.train.prodigy import prodigy

    arch = graft._flagship_arch(tiny=True)
    arch = dataclasses.replace(
        arch, freeze_encoder=True,
        wavlm=dataclasses.replace(arch.wavlm, use_fused_conv=True))
    params, state = init_tagger(jax.random.PRNGKey(0), arch)
    tx = optax.inject_hyperparams(
        lambda learning_rate: prodigy(learning_rate=learning_rate))(
        learning_rate=1.0)
    step = make_train_step(arch, 0.1, 3.0, tx)
    rng = np.random.RandomState(0)
    b, s, t = 2, 4000, 20
    out = step(params, state, tx.init(params), jax.random.PRNGKey(1),
               jnp.asarray((rng.randn(b, s) * 0.1).astype(np.float32)),
               jnp.asarray(rng.randint(0, arch.num_labels, (b, t))
                           .astype(np.int64)),
               jnp.asarray(np.zeros(b, np.int32)),
               jnp.asarray(rng.randint(0, t, (b, 4)).astype(np.int32)),
               jnp.asarray(rng.randint(0, 2, (b, 4)).astype(np.int32)),
               jnp.asarray(rng.rand(b, 4).astype(np.float32)),
               jnp.asarray(np.ones((b, 4), bool)), max_label_len=t)
    assert np.isfinite(float(out[3]["loss"]))


def test_session_warmup(tmp_path):
    """InferenceSession.warmup pre-compiles bucket graphs without error."""
    import yaml
    from wfl_asr_tpu.checkpoint import save_model_checkpoint
    from wfl_asr_tpu.infer.pipeline import InferenceSession
    from wfl_asr_tpu.models.tagger import TaggerArch, init_tagger

    labels = sorted([f"B-p{i}" for i in range(3)]
                    + [f"I-p{i}" for i in range(3)] + ["O"])
    save_dir = tmp_path / "save"
    save_dir.mkdir()
    (save_dir / "phonemes.txt").write_text("\n".join(labels) + "\n")
    (save_dir / "langs.txt").write_text("en,0\n")
    cfg = {"data": {"sample_rate": 16000, "frame_duration": 0.02,
                    "n_mels": 40},
           "model": {"encoder_type": "none", "num_languages": 1,
                     "lang_emb_dim": 8},
           "output": {"save_dir": str(save_dir)},
           "postprocess": {"median_filter": 1, "merge_segments": "none"}}
    config_path = save_dir / "config.yaml"
    config_path.write_text(yaml.dump(cfg, sort_keys=False))
    arch = TaggerArch.from_config(
        __import__("wfl_asr_tpu.config", fromlist=["Config"])
        .Config.load(str(config_path)), len(labels))
    params, state = init_tagger(jax.random.PRNGKey(0), arch)
    ckpt = save_dir / "best_model.pt"
    save_model_checkpoint(str(ckpt), params, state, arch)
    session = InferenceSession(str(config_path), str(ckpt), arch=arch)
    session.warmup(durations_s=(1.0,), num_langs=1)
    logits, offsets = session.forward(
        np.random.RandomState(0).randn(16000).astype(np.float32) * 0.3, [0])
    assert logits.shape[0] == 1 and offsets.shape[-1] == 2


def test_vmem_budget_model_calibration():
    """_vmem_bytes classifies the four round-4 Mosaic compile outcomes
    (docs/TPU_RUNS_r04.log, B=16×30 s bf16 WavLM chain geometry: c=512,
    tile 128, ks=(3,3,3) with the fused input-norm): seq nb=1/2 compile,
    seq nb=4 overflows (measured 16.10 MB), packed nb=2 overflows
    (measured 25.27 MB)."""
    from wfl_asr_tpu.ops.pallas.conv_fused import (VMEM_BUDGET, _vmem_bytes,
                                                   _in_rows_needed)

    tile_out, c, ks = 128, 512, (3, 3, 3)
    t_outs, need = [], tile_out
    for k in reversed(ks):
        t_outs.append(need)
        need = _in_rows_needed(need, k)
    t_outs.reverse()
    main_rows, halo_rows = tile_out * 2 ** len(ks), 128

    def mb(nb, packed):
        return _vmem_bytes(nb, packed, main_rows, halo_rows, tile_out, c,
                           ks, t_outs, 2, True)

    assert mb(1, False) <= VMEM_BUDGET
    assert mb(2, False) <= VMEM_BUDGET
    assert mb(4, False) > VMEM_BUDGET        # measured 16.10 MB
    assert mb(2, True) > VMEM_BUDGET         # measured 25.27 MB
    # magnitude sanity on the measured overflow points (±40%)
    assert abs(mb(4, False) / (16.10 * 2 ** 20) - 1) < 0.4
    assert abs(mb(2, True) / (25.27 * 2 ** 20) - 1) < 0.4
    # monotone in nb for both kernels
    for packed in (False, True):
        assert mb(2, packed) > mb(1, packed)
        assert mb(4, packed) > mb(2, packed)


def test_vmem_guard_clamps_instead_of_oom(monkeypatch, capsys):
    """An over-budget batch_block request clamps (with a notice) and still
    produces correct numerics — the knob must never brick a run."""
    from wfl_asr_tpu.ops.pallas import conv_fused
    monkeypatch.setattr(conv_fused, "PACKED", True)
    # tiny VMEM budget forces the clamp even at test-size shapes
    monkeypatch.setattr(conv_fused, "VMEM_BUDGET", 300 * 1024)
    rng = np.random.RandomState(11)
    b, t, c = 4, 1102, 64
    x = jnp.asarray((rng.randn(b, t, c) * 0.4).astype(np.float32))
    ws = make_chain(6, c, (3, 2, 2))
    ref = xla_chain(x, ws)
    out = fused_conv_chain(x, ws, tile_out=32, batch_block=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)
    assert "clamped batch_block" in capsys.readouterr().out

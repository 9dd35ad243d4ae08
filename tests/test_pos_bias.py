"""WavLM position-bias store: Toeplitz leading-submatrix property and the
bounded single-buffer session cache (VERDICT r2 Weak #2 — the r2 per-length
dict could pin >1 GB of HBM over a varied-duration folder)."""

import numpy as np
import pytest
import yaml

import jax
import jax.numpy as jnp

from wfl_asr_tpu.models.tagger import TaggerArch, init_tagger
from wfl_asr_tpu.models.wavlm import (WavLMArch, position_bias,
                                      relative_position_buckets)


@pytest.fixture(scope="module", autouse=True)
def f32_matmuls():
    with jax.default_matmul_precision("highest"):
        yield


def small_wavlm():
    return WavLMArch(hidden_size=64, num_layers=2, num_heads=4,
                     intermediate_size=128, conv_dim=(32, 32, 32),
                     conv_kernel=(10, 3, 3), conv_stride=(5, 2, 2),
                     num_conv_pos_embeddings=16,
                     num_conv_pos_embedding_groups=4,
                     num_buckets=40, max_distance=100)


def test_bucket_matrix_is_toeplitz_and_nests():
    """bucket(q, k) depends only on k−q, so bias(T') is the leading
    [:T', :T'] submatrix of bias(T_max) — the fact the bounded session
    store relies on."""
    b128 = relative_position_buckets(128, 40, 100)
    b64 = relative_position_buckets(64, 40, 100)
    np.testing.assert_array_equal(b64, b128[:64, :64])
    # Toeplitz: constant along diagonals
    for r in (-100, -3, 0, 5, 90):
        diag = np.diagonal(b128, offset=r)
        assert np.all(diag == diag[0]), f"diagonal {r} not constant"


def test_position_bias_leading_submatrix():
    arch = small_wavlm()
    rng = jax.random.PRNGKey(0)
    params = {"rel_attn_embed": {
        "w": jax.random.normal(rng, (arch.num_buckets, arch.num_heads))}}
    full = np.asarray(position_bias(params, arch, 96))
    small = np.asarray(position_bias(params, arch, 40))
    np.testing.assert_array_equal(small, full[:, :40, :40])


def _make_session(tmp_path, compute_dtype=jnp.float32):
    from wfl_asr_tpu.checkpoint import save_model_checkpoint
    from wfl_asr_tpu.infer.pipeline import InferenceSession

    labels = ["B-a", "I-a", "O"]
    save_dir = tmp_path / "save"
    save_dir.mkdir()
    (save_dir / "phonemes.txt").write_text("\n".join(labels) + "\n")
    (save_dir / "langs.txt").write_text("en,0\n")
    cfg = {"data": {"sample_rate": 16000, "frame_duration": 0.02},
           "model": {"encoder_type": "wavlm", "num_languages": 1,
                     "lang_emb_dim": 8},
           "output": {"save_dir": str(save_dir)},
           "postprocess": {"median_filter": 1, "merge_segments": "none"}}
    config_path = save_dir / "config.yaml"
    config_path.write_text(yaml.dump(cfg, sort_keys=False))
    arch = TaggerArch(encoder_type="wavlm", num_labels=3, num_languages=1,
                      hidden_size=64, lang_emb_dim=8, enable_bilstm=False,
                      num_conformer_layers=1, conformer_heads=2,
                      conformer_ff_expansion=2, conformer_kernel=31,
                      enable_dilated_conv=False, wavlm=small_wavlm())
    params, state = init_tagger(jax.random.PRNGKey(0), arch)
    ckpt = save_dir / "best_model.pt"
    save_model_checkpoint(str(ckpt), params, state, arch)
    return InferenceSession(str(config_path), str(ckpt),
                            compute_dtype=compute_dtype, arch=arch)


def test_session_pos_bias_store_is_bounded(tmp_path):
    """Across many distinct bucket lengths the session holds exactly one
    full-size buffer plus at most one slice — not one entry per length."""
    session = _make_session(tmp_path)
    exact = {}
    lengths = [40, 24, 64, 24, 8, 48, 64, 16, 56, 32]
    running_max = 0
    for t in lengths:
        running_max = max(running_max, t)
        got = session._pos_bias_for(t)
        assert got.shape == (4, t, t)
        if t not in exact:
            exact[t] = np.asarray(position_bias(
                session.params["encoder"], session.arch.wavlm, t))
        np.testing.assert_allclose(np.asarray(got), exact[t],
                                   rtol=1e-6, atol=1e-7)
        # bounded store: one full buffer (at the max length seen) + an LRU
        # of at most _pos_bias_slice_cap shorter-length slices
        assert session._pos_bias_len == running_max
        assert session._pos_bias_full.shape[1] == session._pos_bias_len
        assert len(session._pos_bias_slices) <= session._pos_bias_slice_cap
        for sl_len, sl in session._pos_bias_slices.items():
            assert sl.shape[1] == sl_len

    # alternating between two cached lengths must reuse the SAME device
    # arrays (no per-call re-slice — the r3 thrash fix)
    a1 = session._pos_bias_for(24)
    b1 = session._pos_bias_for(32)
    assert session._pos_bias_for(24) is a1
    assert session._pos_bias_for(32) is b1

    # growing past the previous max replaces the buffer and drops slices
    big = session._pos_bias_for(96)
    assert big.shape == (4, 96, 96)
    assert session._pos_bias_len == 96
    assert 96 not in session._pos_bias_slices


def test_session_pos_bias_bf16_store(tmp_path):
    """bf16 serving stores the buffer at bf16 (half the HBM) and values
    match the f32 computation rounded once."""
    session = _make_session(tmp_path, compute_dtype=jnp.bfloat16)
    got = session._pos_bias_for(48)
    assert got.dtype == jnp.bfloat16
    ref = position_bias(session.params["encoder"],
                        session.arch.wavlm, 48).astype(jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(ref, np.float32))

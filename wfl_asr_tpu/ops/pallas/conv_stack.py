"""Pallas strided-conv kernel for the WavLM feature-encoder layers.

Targets the C_in=C_out=512, k∈{2,3}, stride-2 VALID convolutions (layers
1-6 of the stack), which XLA runs ~2.5× off roofline at these shapes
(docs/PERFORMANCE.md). Strategy per output tile:

- DMA the input span (tile·s + k−s rows, channels-last) from HBM into VMEM,
- reshape [tile·s, C] → [tile, s·C] so each output row's first s taps are
  contiguous lanes → ONE matmul with contraction dim s·C=1024 against the
  tap-packed weights, plus one [tile, C]×[C, C_out] matmul for the k>s tap,
- fused GELU on the accumulator.

Weights stay VMEM-resident across the grid; the input is read exactly once.
Forward-only (inference); training keeps XLA convs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_TILE = 512


def _kernel(x_hbm, w01_ref, w2_ref, out_ref, scratch, sem, *,
            tile: int, k: int, s: int, span: int, apply_gelu: bool):
    bi = pl.program_id(0)
    ti = pl.program_id(1)
    in_start = pl.multiple_of(ti * tile * s, tile * s)

    copy = pltpu.make_async_copy(
        x_hbm.at[bi, pl.ds(in_start, span), :], scratch, sem)
    copy.start()
    copy.wait()

    c_in = scratch.shape[1]
    v0 = scratch[pl.ds(0, tile * s), :].reshape(tile, s * c_in)
    acc = jax.lax.dot_general(
        v0, w01_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    if k > s:
        v1 = scratch[pl.ds(s, tile * s), :].reshape(tile, s * c_in)
        rem = (k - s) * c_in
        acc = acc + jax.lax.dot_general(
            v1[:, :rem], w2_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    if apply_gelu:
        acc = jax.nn.gelu(acc, approximate=False)
    out_ref[0] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("stride", "apply_gelu", "tile"))
def conv_stride_matmul(x: jnp.ndarray, w: jnp.ndarray, stride: int = 2,
                       apply_gelu: bool = True,
                       tile: int = DEFAULT_TILE) -> jnp.ndarray:
    """VALID Conv1d (k ≤ 2·stride, no bias) + optional fused GELU.

    x: [B, T, C_in] (channels-last); w: [C_out, C_in, k] (torch layout).
    Returns [B, T_out, C_out].
    """
    b, t_in, c_in = x.shape
    c_out, _, k = w.shape
    if k > 2 * stride:
        raise ValueError("kernel supports k <= 2*stride")
    t_out = (t_in - k) // stride + 1
    n_tiles = -(-t_out // tile)

    # Pad the time axis so every tile's input span exists.
    span = tile * stride + stride  # tile*s rows + one extra group for k>s
    needed = (n_tiles - 1) * tile * stride + span
    if needed > t_in:
        x = jnp.pad(x, ((0, 0), (0, needed - t_in), (0, 0)))

    # Tap-packed weights: rows ordered (tap0 channels..., tap1 channels...).
    w_taps = [jnp.asarray(w[:, :, j]).T for j in range(k)]       # [C_in, C_out]
    w01 = jnp.concatenate(w_taps[:stride] if k >= stride else w_taps,
                          axis=0)                                 # [s·C_in, C_out]
    if k < stride:
        w01 = jnp.concatenate(
            [w01, jnp.zeros(((stride - k) * c_in, c_out), w01.dtype)], axis=0)
    if k > stride:
        w2 = jnp.concatenate(w_taps[stride:], axis=0)            # [(k−s)·C_in, C_out]
    else:
        w2 = jnp.zeros((c_in, c_out), w01.dtype)
    w01 = w01.astype(x.dtype)
    w2 = w2.astype(x.dtype)

    kernel = functools.partial(_kernel, tile=tile, k=k, s=stride, span=span,
                               apply_gelu=apply_gelu)
    out = pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),                # x in HBM
            pl.BlockSpec((w01.shape[0], c_out), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w2.shape[0], c_out), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, c_out), lambda bi, ti: (bi, ti, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_tiles * tile, c_out), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((span, c_in), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=jax.devices()[0].platform != "tpu",
    )(x, w01, w2)
    return out[:, :t_out]

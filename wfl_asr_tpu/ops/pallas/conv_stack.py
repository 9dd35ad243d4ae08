"""Pallas strided-conv kernel for the WavLM feature-encoder layers.

Targets the C_in=C_out=512, k∈{2,3}, stride-2 VALID convolutions (layers
1-6 of the stack), which XLA runs ~2.5× off roofline at these shapes
(docs/PERFORMANCE.md).

Design (k ≤ 2s, tap-grouped matmuls, everything BlockSpec-pipelined):

- Input is viewed channels-last and reshaped per block to [tile, s·C], so
  the first s taps of every output row are contiguous lanes → ONE matmul
  with contraction dim s·C against tap-packed weights ``W01``.
- The k>s tap needs the *next* output row's group. Computed as
  ``t2 = v0[:, :C] @ W2`` then shifted up one row with an f32 sublane
  rotate (32-bit rotates are supported by Mosaic; bf16 ones are not), and
  the last row is corrected from a small 8-row view of the next block.
- No manual DMA: all operands are BlockSpec blocks, so Pallas
  double-buffers the HBM→VMEM streams automatically.

Forward-only convenience (inference); training keeps XLA convs. GELU is
applied by the caller (Mosaic cannot lower erf).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_TILE = 512


def _kernel(x_ref, xnext_ref, w01_ref, w2_ref, out_ref, *,
            tile: int, k: int, s: int):
    c_in = x_ref.shape[2]
    v0 = x_ref[0].reshape(tile, s * c_in)
    acc = jax.lax.dot_general(
        v0, w01_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    if k > s:
        rem = (k - s) * c_in
        t2 = jax.lax.dot_general(
            v0[:, :rem], w2_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # needed at row-1
        t2_up = pltpu.roll(t2, shift=tile - 1, axis=0)   # row t ← t2[t+1]
        # last row correction from the next block's first group
        gnext = xnext_ref[0, pl.ds(0, 8), :]             # [8, C]
        last = jax.lax.dot_general(
            gnext[:s].reshape(1, s * c_in)[:, :rem], w2_ref[:],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        row_idx = jax.lax.broadcasted_iota(jnp.int32, t2_up.shape, 0)
        acc = acc + jnp.where(row_idx == tile - 1, last, t2_up)
    out_ref[0] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("stride", "tile"))
def conv_stride_matmul(x: jnp.ndarray, w: jnp.ndarray, stride: int = 2,
                       tile: int = DEFAULT_TILE) -> jnp.ndarray:
    """VALID Conv1d (k ≤ 2·stride, no bias).

    x: [B, T, C_in] (channels-last); w: [C_out, C_in, k] (torch layout).
    Returns [B, T_out, C_out].
    """
    b, t_in, c_in = x.shape
    c_out, _, k = w.shape
    if k > 2 * stride:
        raise ValueError("kernel supports k <= 2*stride")
    t_out = (t_in - k) // stride + 1
    n_tiles = -(-t_out // tile)

    # Pad so n_tiles+1 full blocks exist (the "next block" view of the last
    # tile reads one block beyond).
    needed = (n_tiles + 1) * tile * stride
    if needed > t_in:
        x = jnp.pad(x, ((0, 0), (0, needed - t_in), (0, 0)))

    # Tap-packed weights, rows ordered (tap0 channels..., tap1 channels...).
    w_taps = [jnp.asarray(w[:, :, j]).T for j in range(k)]
    w01 = jnp.concatenate(w_taps[:stride], axis=0) if k >= stride else \
        jnp.concatenate(
            w_taps + [jnp.zeros(((stride - k) * c_in, c_out), x.dtype)], axis=0)
    w2 = (jnp.concatenate(w_taps[stride:], axis=0) if k > stride
          else jnp.zeros((c_in, c_out), x.dtype))
    w01 = w01.astype(x.dtype)
    w2 = w2.astype(x.dtype)

    block_rows = tile * stride
    kernel = functools.partial(_kernel, tile=tile, k=k, s=stride)
    out = pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, block_rows, c_in),
                         lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_rows, c_in),
                         lambda bi, ti: (bi, ti + 1, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((stride * c_in, c_out), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w2.shape[0], c_out), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, c_out), lambda bi, ti: (bi, ti, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_tiles * tile, c_out), x.dtype),
        interpret=jax.devices()[0].platform != "tpu",
    )(x, x, w01, w2)
    return out[:, :t_out]

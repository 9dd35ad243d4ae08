"""Multi-layer fused Pallas kernel for the WavLM feature-encoder chain.

Layers 1-6 of the WavLM conv stack (C=512, k∈{3,2}, stride 2, VALID, GELU
between layers — reference model.py:72-81 delegates to HF WavLM's
``WavLMFeatureEncoder``) are a bandwidth problem under XLA: each layer
round-trips its full [B, T_i, 512] activation through HBM (~95 MB/elem at
30 s). This kernel runs a *chain* of such layers inside one ``pallas_call``:
a tile of the final layer's output is produced by streaming the chain's
input once from HBM and keeping every intermediate activation in VMEM.

Per-layer compute (channels-last, stride 2) reuses the tap-grouped matmul
trick from ``conv_stack.py``:

- reshape ``[2·t+2, C] → [t+1, 2C]`` puts taps 0,1 of each output row in
  contiguous lanes → one MXU matmul against tap-packed ``W01 [2C, C]``;
- the k=3 tap needs the *next* row-pair's first half: computed for all
  ``t+1`` rows as ``v0[:, :C] @ W2`` and shifted up one row with an f32
  sublane roll (computing one extra row makes the old kernel's last-row
  halo correction unnecessary);
- GELU (exact, via erf) applied in f32, cast back to the streaming dtype.

Tiles overlap by the chain's receptive-field overhang (≤ 14 rows for three
k=3 layers), served by a 128-row halo block that aliases the next tile's
rows — no manual DMA, all operands are BlockSpec-pipelined.

Forward-only (inference path); training keeps XLA convs.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HALO_ROWS = 128
DEFAULT_TILE = 256


def _gelu_f32(x: jnp.ndarray) -> jnp.ndarray:
    # jax.lax.erf lowers on both Mosaic and interpret mode; exact GELU keeps
    # numeric parity with the XLA path.
    return 0.5 * x * (1.0 + jax.lax.erf(x * (1.0 / jnp.sqrt(2.0).astype(x.dtype))))


def _in_rows_needed(t_out: int, k: int) -> int:
    # k=3: the [t+1]-row tap trick reads rows [0, 2·t_out+2);
    # k=2: exactly 2·t_out rows.
    return 2 * t_out + (2 if k == 3 else 0)


def _kernel(x_ref, halo_ref, *rest, ks: Sequence[int],
            t_outs: Sequence[int], c: int):
    w_refs, out_ref = rest[:-1], rest[-1]
    cur = jnp.concatenate([x_ref[0], halo_ref[0]], axis=0)   # [main+128, C]
    wi = 0
    for k, t_o in zip(ks, t_outs):
        if k == 3:
            w01, w2 = w_refs[wi][:], w_refs[wi + 1][:]
            wi += 2
            v0 = cur[: 2 * t_o + 2].reshape(t_o + 1, 2 * c)
            acc = jax.lax.dot_general(
                v0[:t_o], w01, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)          # taps 0,1
            t2 = jax.lax.dot_general(
                v0[:, :c], w2, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)          # tap 2, rows+1
            # row i needs t2[i+1]: roll up one row (f32 sublane rotate)
            acc = acc + pltpu.roll(t2, shift=t_o, axis=0)[:t_o]
        else:  # k == 2
            w01 = w_refs[wi][:]
            wi += 1
            v0 = cur[: 2 * t_o].reshape(t_o, 2 * c)
            acc = jax.lax.dot_general(
                v0, w01, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        cur = _gelu_f32(acc).astype(x_ref.dtype)
    out_ref[0] = cur


@functools.partial(jax.jit, static_argnames=("tile_out",))
def fused_conv_chain(x: jnp.ndarray, weights: Sequence[jnp.ndarray],
                     tile_out: int = DEFAULT_TILE) -> jnp.ndarray:
    """Fused chain of stride-2 VALID Conv1d(+GELU) layers.

    x: [B, T, C] channels-last; weights: per layer [C, C, k] (torch
    ``OIH`` layout), k ∈ {2, 3}, no bias. Returns [B, T_chain, C] where
    T_chain is the exact composed conv output length.
    """
    b, t_in, c = x.shape
    ks = [int(w.shape[2]) for w in weights]
    for w in weights:
        if w.shape[0] != c or w.shape[1] != c:
            raise ValueError("fused chain requires C_in == C_out == C")
    if any(k not in (2, 3) for k in ks):
        raise ValueError("fused chain supports k in {2, 3} (stride 2)")

    t_true = t_in
    for k in ks:
        t_true = (t_true - k) // 2 + 1
    if t_true <= 0:
        raise ValueError("input too short for the conv chain")

    factor = 2 ** len(ks)
    tile_out = min(tile_out, -(-t_true // 8) * 8)
    main_rows = tile_out * factor

    # Static per-layer output row counts inside one tile (composed
    # backwards from tile_out), and the halo requirement.
    t_outs = []
    need = tile_out
    for k in reversed(ks):
        t_outs.append(need)
        need = _in_rows_needed(need, k)
    t_outs.reverse()
    # Halo: a 128-row view of the next tile's rows when the main block is
    # 128-aligned; otherwise (tiny models) fall back to aliasing the whole
    # next main block.
    if main_rows % HALO_ROWS == 0:
        halo_rows = HALO_ROWS
        halo_step = main_rows // HALO_ROWS
        halo_index = lambda bi, ti: (bi, (ti + 1) * halo_step, 0)
    else:
        halo_rows = main_rows
        halo_index = lambda bi, ti: (bi, ti + 1, 0)
    if need > main_rows + halo_rows:
        raise ValueError("tile receptive field exceeds main+halo rows")

    n_tiles = -(-t_true // tile_out)
    rows_padded = n_tiles * main_rows + halo_rows
    if rows_padded > t_in:
        x = jnp.pad(x, ((0, 0), (0, rows_padded - t_in), (0, 0)))

    # Tap-packed weights at the streaming dtype: W01 [2C, C] rows ordered
    # (tap0 channels…, tap1 channels…); W2 [C, C] for k=3.
    w_args = []
    w_specs = []
    for w in weights:
        k = int(w.shape[2])
        taps = [jnp.asarray(w[:, :, j]).T.astype(x.dtype) for j in range(k)]
        w01 = jnp.concatenate(taps[:2], axis=0)
        w_args.append(w01)
        w_specs.append(pl.BlockSpec((2 * c, c), lambda bi, ti: (0, 0),
                                    memory_space=pltpu.VMEM))
        if k == 3:
            w_args.append(taps[2])
            w_specs.append(pl.BlockSpec((c, c), lambda bi, ti: (0, 0),
                                        memory_space=pltpu.VMEM))

    kernel = functools.partial(_kernel, ks=tuple(ks), t_outs=tuple(t_outs),
                               c=c)

    out = pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, main_rows, c), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, halo_rows, c), halo_index,
                         memory_space=pltpu.VMEM),
            *w_specs,
        ],
        out_specs=pl.BlockSpec((1, tile_out, c), lambda bi, ti: (bi, ti, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_tiles * tile_out, c), x.dtype),
        interpret=jax.devices()[0].platform != "tpu",
    )(x, x, *w_args)
    return out[:, :t_true]

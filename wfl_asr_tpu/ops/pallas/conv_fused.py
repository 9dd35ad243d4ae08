"""Multi-layer fused Pallas kernel for the WavLM feature-encoder chain.

Layers 1-6 of the WavLM conv stack (C=512, k∈{3,2}, stride 2, VALID, GELU
between layers — reference model.py:72-81 delegates to HF WavLM's
``WavLMFeatureEncoder``) are a bandwidth problem under XLA: each layer
round-trips its full [B, T_i, 512] activation through HBM (~95 MB/elem at
30 s). This kernel runs a *chain* of such layers inside one ``pallas_call``:
a tile of the final layer's output is produced by streaming the chain's
input once from HBM and keeping every intermediate activation in VMEM.

Per-layer compute (channels-last, stride 2) uses a tap-grouped matmul
(originally prototyped as a single-layer ``conv_stack.py`` kernel, since
superseded by this chained version and removed):

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
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .flash_attention import _interpret

import os

HALO_ROWS = 128
# 128 output rows × 2³ stride = 1024-row input blocks: with three k=3
# layers' weights (4.5 MB bf16) plus double-buffered streams and the f32
# accumulators of the widest layer, this stays inside the ~16 MB VMEM.
DEFAULT_TILE = int(os.environ.get("WFL_CONV_TILE", "128"))
MAX_CHAIN = int(os.environ.get("WFL_CONV_CHAIN", "3"))
# Batch elements per grid invocation. The probe (scripts/probe_conv_vpu.py)
# suggested the chains' floor was per-invocation grid overhead (~11 µs ×
# ~1900 invocations at B=16×30 s); packing rows per invocation was measured
# and REJECTED: WFL_CONV_BB=2 is 37.5 vs 36.1 ms at B=16×30 s bf16 (the
# input/halo/output streams double while the sequential in-kernel row loop
# adds no overlap) and WFL_CONV_BB=4 overflows scoped VMEM (16.10 MB > 16).
# The knob stays for reproducing the sweep (scripts/ablate_conv.py).
DEFAULT_BATCH_BLOCK = int(os.environ.get("WFL_CONV_BB", "1"))
# WFL_CONV_PACKED=1 (with WFL_CONV_BB>1): instead of the sequential
# in-kernel row loop, fuse the invocation's nb batch rows into single
# taller matmuls ([nb·(t+1), 2C] @ [2C, C]) — the grid-packing variant of
# the dispatch-floor question (VERDICT r3 #6): same halved invocation
# count as WFL_CONV_BB, but the extra rows become MXU work in ONE dot
# instead of nb sequential small dots.
PACKED = os.environ.get("WFL_CONV_PACKED", "0") == "1"


def _erf_f32(x: jnp.ndarray) -> jnp.ndarray:
    """Abramowitz & Stegun 7.1.26 rational approximation, |err| ≤ 1.5e-7
    (below f32 resolution of the surrounding bf16 activations). Mosaic has
    no erf lowering (verified: 'Unimplemented primitive … erf'), and exp
    does lower; used in interpret mode too so CPU tests match TPU."""
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    e = 1.0 - poly * jnp.exp(-a * a)
    return jnp.sign(x) * e


def _gelu_f32(x: jnp.ndarray) -> jnp.ndarray:
    return 0.5 * x * (1.0 + _erf_f32(x * np.float32(1.0 / np.sqrt(2.0))))


def _in_rows_needed(t_out: int, k: int) -> int:
    # k=3: the [t+1]-row tap trick reads rows [0, 2·t_out+2);
    # k=2: exactly 2·t_out rows.
    return 2 * t_out + (2 if k == 3 else 0)


def _kernel_packed(x_ref, halo_ref, mean_ref, inv_ref, scale_ref, bias_ref,
                   *rest, ks: Sequence[int], t_outs: Sequence[int], c: int,
                   has_norm: bool):
    """Batch-packed variant: the invocation's nb rows are carried as the
    leading dim of every intermediate and each layer runs ONE
    [nb·rows, 2C] @ [2C, C] matmul (rows flattened across batch), so the
    per-invocation fixed cost is amortized over nb× the MXU work. The k=3
    tap-2 rows are over-computed by one row per element and discarded
    after the 3-D reshape (same trick as the per-row kernel)."""
    w_refs, out_ref = rest[:-1], rest[-1]
    nb = x_ref.shape[0]
    cur = jnp.concatenate([x_ref[:], halo_ref[:]], axis=1)  # [nb,main+128,C]
    if has_norm:
        xf = (cur.astype(jnp.float32) - mean_ref[:]) * inv_ref[:]
        cur = _gelu_f32(xf * scale_ref[0] + bias_ref[0]).astype(x_ref.dtype)
    wi = 0
    for k, t_o in zip(ks, t_outs):
        if k == 3:
            w01, w2 = w_refs[wi][:], w_refs[wi + 1][:]
            wi += 2
            # [nb, 2t+2, C] → [nb, t+1, 2C] (row-pair merge per element)
            v0 = cur[:, : 2 * t_o + 2].reshape(nb, t_o + 1, 2 * c)
            v0f = v0.reshape(nb * (t_o + 1), 2 * c)
            acc = jax.lax.dot_general(
                v0f, w01, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)              # taps 0,1
            t2 = jax.lax.dot_general(
                v0f[:, :c], w2, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)              # tap 2
            acc = acc.reshape(nb, t_o + 1, c)
            t2 = t2.reshape(nb, t_o + 1, c)
            # row i needs t2[i+1]: roll up one row on the sublane axis
            acc = acc[:, :t_o] + pltpu.roll(t2, shift=t_o, axis=1)[:, :t_o]
        else:  # k == 2
            w01 = w_refs[wi][:]
            wi += 1
            v0 = cur[:, : 2 * t_o].reshape(nb * t_o, 2 * c)
            acc = jax.lax.dot_general(
                v0, w01, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).reshape(nb, t_o, c)
        cur = _gelu_f32(acc).astype(x_ref.dtype)
    out_ref[:] = cur


def _kernel(x_ref, halo_ref, mean_ref, inv_ref, scale_ref, bias_ref,
            *rest, ks: Sequence[int], t_outs: Sequence[int], c: int,
            has_norm: bool):
    w_refs, out_ref = rest[:-1], rest[-1]
    # Static loop over the invocation's batch rows: streams (x/halo/out)
    # carry all nb rows, per-layer intermediates are per-row (sequential).
    for e in range(x_ref.shape[0]):
        cur = jnp.concatenate([x_ref[e], halo_ref[e]], axis=0)  # [main+128,C]
        if has_norm:
            # Fused per-(batch,channel) GroupNorm application + GELU on the
            # input tile: the stats are a cheap XLA reduction, but applying
            # them as a separate pass costs a full read+write of the [B,T,C]
            # activation (~7.5 ms at B=16×30 s). Halo rows are renormalized
            # when they reappear as the next tile's main rows — stateless.
            xf = (cur.astype(jnp.float32) - mean_ref[e]) * inv_ref[e]
            cur = _gelu_f32(xf * scale_ref[0] + bias_ref[0]) \
                .astype(x_ref.dtype)
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
        out_ref[e] = cur


@functools.partial(jax.jit,
                   static_argnames=("tile_out", "mesh", "batch_block"))
def fused_conv_chain(x: jnp.ndarray, weights: Sequence[jnp.ndarray],
                     tile_out: int = DEFAULT_TILE,
                     input_norm=None, mesh=None,
                     batch_block: int = DEFAULT_BATCH_BLOCK) -> jnp.ndarray:
    """Fused chain of stride-2 VALID Conv1d(+GELU) layers.

    x: [B, T, C] channels-last; weights: per layer [C, C, k] (torch
    ``OIH`` layout), k ∈ {2, 3}, no bias. Returns [B, T_chain, C] where
    T_chain is the exact composed conv output length.

    input_norm: optional (mean [B,C], inv [B,C], scale [C], bias [C]) —
    applies per-(batch,channel) normalization + GELU to the *input* inside
    the kernel (the WavLM layer-0 GroupNorm application fused into the
    first chain's streaming pass).

    ``mesh``: run per-shard under shard_map over a ('data','model') mesh —
    batch rows on 'data', weights/scale/bias replicated (the conv chain is
    per-sample independent, so DP sharding is exact).
    """
    if mesh is not None and mesh.size > 1:
        from jax.sharding import PartitionSpec as P
        from .flash_attention import shard_wrap
        core = lambda x_, w_, n_: _fused_conv_impl(x_, w_, n_, tile_out,
                                                   batch_block)
        row = P("data", None)
        fn = shard_wrap(core, mesh, per_arg_specs=(
            P("data", None, None), P(),
            (row, row, P(), P()) if input_norm is not None else None),
            out_spec=P("data", None, None))
        return fn(x, list(weights), input_norm)
    return _fused_conv_impl(x, list(weights), input_norm, tile_out,
                            batch_block)


VMEM_BUDGET = 16 * 1024 * 1024


def _vmem_bytes(nb: int, packed: bool, main_rows: int, halo_rows: int,
                tile_out: int, c: int, ks, t_outs, esize: int,
                has_norm: bool) -> int:
    """Trace-time estimate of one invocation's scoped-VMEM footprint.

    Calibrated against the round-4 Mosaic measurements at B=16×30 s
    (docs/TPU_RUNS_r04.log): seq nb=1/nb=2 compile, seq nb=4 overflows at
    16.10 MB, packed nb=2 at 25.27 MB — this model classifies all four
    correctly at the 16 MB budget. Streams are counted single-buffered
    (matches the measurements better than ×2; the halo aliases the input
    array). In the sequential kernel the per-row intermediates are reused
    across the unrolled batch loop, so they don't scale with nb; in the
    packed kernel everything carries the nb leading dim.
    """
    nb_eff = nb if packed else 1
    streams = nb * (main_rows + halo_rows + tile_out) * c * esize
    weights = sum(3 * c * c if k == 3 else 2 * c * c for k in ks) * esize
    xf = nb_eff * (main_rows + halo_rows) * c * 4 if has_norm else 0
    cur = 2 * nb_eff * (main_rows + halo_rows) * c * esize
    scratch = max((3 if k == 3 else 2) * nb_eff * (t_o + 1) * c * 4
                  for k, t_o in zip(ks, t_outs))
    return streams + weights + xf + cur + scratch


def _fused_conv_impl(x, weights, input_norm, tile_out: int,
                     batch_block: int = 1) -> jnp.ndarray:
    b, t_in, c = x.shape
    # Largest divisor of b not exceeding the requested batch block.
    nb = max(1, min(batch_block, b))
    while b % nb:
        nb -= 1
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

    # VMEM guard: shrink nb (and drop the packed kernel at nb=1) instead of
    # letting Mosaic die on scoped-VMEM overflow — WFL_CONV_BB/_PACKED are
    # sweep knobs and must never brick a run (VERDICT r4 weak #1).
    esize = jnp.dtype(x.dtype).itemsize
    nb_req = nb
    packed_req = packed = PACKED and nb > 1
    while nb > 1 and _vmem_bytes(nb, packed, main_rows, halo_rows, tile_out,
                                 c, ks, t_outs, esize, input_norm is not None
                                 ) > VMEM_BUDGET:
        if packed:
            # the sequential kernel at the SAME nb is strictly smaller
            # (per-row intermediates don't scale with nb) — try it before
            # giving up batch rows.
            packed = False
            continue
        nb -= 1
        while b % nb:
            nb -= 1
    if nb == 1:
        packed = False
    if nb < nb_req or packed != packed_req:
        print(f"wfl conv_fused: clamped batch_block {nb_req} "
              f"(packed={packed_req}) -> {nb} (packed={packed}) to fit "
              f"the ~16 MB VMEM budget", flush=True)

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

    # Norm vectors as [*, 1, C] so blocks are (nb, 1, c): the sublane dim
    # equals the array dim (Mosaic tiling rule for short dims).
    has_norm = input_norm is not None
    if has_norm:
        mean, inv, scale, bias = input_norm
        norm_args = [jnp.asarray(mean, jnp.float32).reshape(b, 1, c),
                     jnp.asarray(inv, jnp.float32).reshape(b, 1, c),
                     jnp.asarray(scale, jnp.float32).reshape(1, 1, c),
                     jnp.asarray(bias, jnp.float32).reshape(1, 1, c)]
    else:
        norm_args = [jnp.zeros((1, 1, 1), jnp.float32)] * 4
    shp = (nb, 1, c) if has_norm else (1, 1, 1)
    shared_shp = (1, 1, c) if has_norm else (1, 1, 1)
    per_b = (lambda bi, ti: (bi, 0, 0)) if has_norm \
        else (lambda bi, ti: (0, 0, 0))
    shared = lambda bi, ti: (0, 0, 0)
    norm_specs = [
        pl.BlockSpec(shp, per_b, memory_space=pltpu.VMEM),   # mean [B,1,C]
        pl.BlockSpec(shp, per_b, memory_space=pltpu.VMEM),   # inv [B,1,C]
        pl.BlockSpec(shared_shp, shared,
                     memory_space=pltpu.VMEM),               # scale [1,1,C]
        pl.BlockSpec(shared_shp, shared,
                     memory_space=pltpu.VMEM),               # bias [1,1,C]
    ]

    kernel_fn = _kernel_packed if packed else _kernel
    kernel = functools.partial(kernel_fn, ks=tuple(ks), t_outs=tuple(t_outs),
                               c=c, has_norm=has_norm)

    out = pl.pallas_call(
        kernel,
        grid=(b // nb, n_tiles),
        in_specs=[
            pl.BlockSpec((nb, main_rows, c), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, halo_rows, c), halo_index,
                         memory_space=pltpu.VMEM),
            *norm_specs,
            *w_specs,
        ],
        out_specs=pl.BlockSpec((nb, tile_out, c), lambda bi, ti: (bi, ti, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_tiles * tile_out, c), x.dtype),
        interpret=_interpret(),
    )(x, x, *norm_args, *w_args)
    return out[:, :t_true]

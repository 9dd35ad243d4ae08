"""Pipeline parallelism (GPipe schedule) for the encoder transformer stack.

The reference is single-device; this is a TPU-native extension. The deep
encoders (wavlm-large: 24 identical layers) are the dominant weight/
activation footprint, and their layers are homogeneous pytrees — exactly
the shape pipeline parallelism wants:

- ``stack_layers`` stacks the per-layer parameter dicts into one pytree
  with a leading ``[L]`` axis; ``place_stacked`` shards that axis over the
  mesh's ``stage`` axis (``L`` must divide by S), so each device holds
  ``L/S`` contiguous layers and the full stack exists exactly once across
  the pipeline group.
- ``gpipe_apply`` runs the classic GPipe schedule as ONE jitted program:
  ``shard_map`` over ``('data', 'stage')``, a ``lax.scan`` over
  ``M + S - 1`` ticks, each tick applying the device's local layers
  (inner ``lax.scan`` over ``L/S``) and handing activations to the next
  stage with ``lax.ppermute`` over ICI. Microbatch rows stay sharded on
  ``data``, so PP composes with DP.
- The last stage's outputs are gathered with one masked ``psum`` at the
  end (every other stage contributes zeros), which replicates the result
  across stages — the layout every downstream consumer (heads, losses)
  already expects.

Everything is `lax` control flow — no data-dependent Python, one compile.
The schedule is differentiable (scan/ppermute/psum all have transposes),
but the model entry points currently expose PP for deterministic forwards
only (inference / frozen-encoder feature extraction): per-layer dropout
RNG threading under the tick scan is not implemented.

Bubble math: utilization is M / (M + S - 1) — callers pick
``microbatches`` ≥ ~4×stages to keep the bubble small. Per-invocation
weight traffic is unchanged (each layer's weights live on exactly one
stage), and per-device activation residency is one microbatch per tick
instead of the full batch.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_pp_mesh(num_stages: int, num_devices: Optional[int] = None,
                 devices: Optional[Sequence] = None) -> Mesh:
    """A ``('data', 'stage')`` mesh: the trailing axis is the pipeline
    (adjacent devices are ICI neighbours on real slices), the leading axis
    is data parallelism over pipeline replicas."""
    devices = list(devices if devices is not None else jax.devices())
    if num_devices is not None:
        devices = devices[:num_devices]
    n = len(devices)
    if num_stages < 2:
        raise ValueError(f"num_stages must be >= 2, got {num_stages}")
    if n % num_stages != 0:
        raise ValueError(f"{n} devices not divisible by num_stages="
                         f"{num_stages}")
    grid = np.array(devices).reshape(n // num_stages, num_stages)
    return Mesh(grid, ("data", "stage"))


def stack_layers(layers: List[dict]):
    """List of homogeneous per-layer param dicts → one pytree with a
    leading ``[L]`` axis on every leaf."""
    if not layers:
        raise ValueError("no layers to stack")
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)


def unstack_layers(stacked) -> List[dict]:
    """Inverse of ``stack_layers`` (host-side; checkpoint export path)."""
    leaves = jax.tree_util.tree_leaves(stacked)
    n = int(leaves[0].shape[0])
    return [jax.tree_util.tree_map(lambda x: x[i], stacked)
            for i in range(n)]


def place_stacked(stacked, mesh: Mesh):
    """Shard a stacked layer pytree's leading (layer) axis over ``stage``
    (replicated over ``data``). L must divide the stage-axis size."""
    s = dict(mesh.shape)["stage"]
    n_layers = int(jax.tree_util.tree_leaves(stacked)[0].shape[0])
    if n_layers % s != 0:
        raise ValueError(f"{n_layers} layers not divisible by "
                         f"{s} pipeline stages")

    def put(x):
        return jax.device_put(x, NamedSharding(
            mesh, P("stage", *([None] * (x.ndim - 1)))))

    return jax.tree_util.tree_map(put, stacked)


def pp_shardings(tree, mesh: Mesh):
    """Pytree of NamedShardings for a tagger param/opt-state tree whose
    encoder layers are STACKED (``stack_layers``): any leaf under an
    ``encoder``→``layers`` dict path shards its leading (layer) axis over
    ``stage``; everything else replicates. Optimizer-state trees mirror
    the param paths (optax moments embed the param tree), so the same
    path rule places them consistently — the train-loop counterpart of
    tp.py's ``tp_shardings``."""
    def spec(path, leaf):
        keys = [getattr(k, "key", getattr(k, "name", str(k)))
                for k in path]
        for i in range(len(keys) - 1):
            if keys[i] == "encoder" and keys[i + 1] == "layers":
                if leaf.ndim >= 1:
                    return P("stage", *([None] * (leaf.ndim - 1)))
                return P()
        return P()

    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, spec(path, leaf)), tree)


def shard_params_pp(tree, mesh: Mesh):
    """Place a (stacked-encoder) tree with ``pp_shardings``."""
    return jax.tree_util.tree_map(jax.device_put, tree,
                                  pp_shardings(tree, mesh))


def gpipe_apply(layer_fn: Callable, stacked, x: jnp.ndarray,
                mesh: Mesh, microbatches: int,
                per_row=(), shared=(), rng=None):
    """Pipelined ``for layer in layers: x = layer_fn(layer, x, ...)``.

    ``layer_fn(layer_params, h, per_row, shared) -> h`` applies ONE layer
    to a microbatch ``h [mb, T, H]``. ``per_row`` is a pytree of
    ``[B, ...]`` arrays sliced per microbatch alongside ``x`` (e.g. frame
    masks); ``shared`` is a pytree of replicated operands identical for
    every microbatch (e.g. the position bias). Both may be empty tuples.

    ``stacked`` is the ``place_stacked`` pytree; ``x`` is ``[B, T, H]``
    with B divisible by ``microbatches``, and microbatch rows divisible by
    the data-axis size. Returns ``[B, T, H]``, replicated over ``stage``.

    ``rng``: a PRNG key enabling stochastic layers (dropout) under the
    tick scan — training mode. When given, ``layer_fn`` is called with two
    extra arguments ``(key, layer_key)``: ``layer_key =
    fold_in(rng, global_layer_index)`` is identical for every microbatch
    of a layer (whole-batch decisions like LayerDrop draw from it, so one
    optimizer step skips a layer for ALL samples or none — HF semantics),
    and ``key = fold_in(layer_key, microbatch_index)`` is unique per
    (layer, microbatch) for per-element dropout masks. The masks are
    i.i.d. but deliberately NOT the sequential loop's split sequence (a
    pipelined schedule has no global pop order). The whole schedule is
    differentiable — scan/ppermute/psum/dynamic-slice all have
    transposes, and the warmup/drain garbage ticks receive zero
    cotangents (their results never reach the output).
    """
    shape = dict(mesh.shape)
    S = shape["stage"]
    M = int(microbatches)
    B = x.shape[0]
    if M < 1 or B % M:
        raise ValueError(f"batch {B} not divisible by microbatches={M}")
    mb = B // M
    if mb % shape["data"]:
        raise ValueError(f"microbatch rows {mb} not divisible by the "
                         f"{shape['data']}-way data axis")

    n_layers = int(jax.tree_util.tree_leaves(stacked)[0].shape[0])
    if n_layers % S:
        raise ValueError(f"{n_layers} layers not divisible by {S} stages")

    def to_mb(a):
        return a.reshape((M, mb) + a.shape[1:])

    x_mb = to_mb(x)
    per_row_mb = jax.tree_util.tree_map(to_mb, per_row)

    layer_specs = jax.tree_util.tree_map(
        lambda l: P("stage", *([None] * (l.ndim - 1))), stacked)
    row_spec = lambda a: P(None, "data", *([None] * (a.ndim - 2)))
    per_row_specs = jax.tree_util.tree_map(row_spec, per_row_mb)
    shared_specs = jax.tree_util.tree_map(lambda _: P(), shared)

    lps = n_layers // S

    def pipeline(local_layers, xs, rows, shr, key):
        # local_layers: [L/S, ...] — this stage's slice.
        # xs: [M, mb/data, T, H] — per-device microbatch rows.
        idx = jax.lax.axis_index("stage")

        def apply_local(h, rows_t, mb_idx):
            def body(h, layer_i):
                lp, li = layer_i
                if key is not None:
                    lk = jax.random.fold_in(key, idx * lps + li)
                    return layer_fn(lp, h, rows_t, shr,
                                    jax.random.fold_in(lk, mb_idx), lk), None
                return layer_fn(lp, h, rows_t, shr), None
            h, _ = jax.lax.scan(body, h,
                                (local_layers, jnp.arange(lps)))
            return h

        fwd_perm = [(i, (i + 1) % S) for i in range(S)]
        zero = jnp.zeros_like(xs[0])

        def tick(carry, t):
            buf, out = carry
            t_in = jnp.clip(t, 0, M - 1)
            feed = jax.lax.dynamic_index_in_dim(xs, t_in, 0, keepdims=False)
            # Each stage works on microbatch (t - idx); clamp keeps the
            # warmup/drain ticks in range (their results are discarded).
            t_here = jnp.clip(t - idx, 0, M - 1)
            rows_t = jax.tree_util.tree_map(
                lambda r: jax.lax.dynamic_index_in_dim(
                    r, t_here, 0, keepdims=False), rows)
            h = jnp.where(idx == 0, feed, buf)
            h = apply_local(h, rows_t, t_here)
            nxt = jax.lax.ppermute(h, "stage", fwd_perm)
            # The last stage finishes microbatch (t - S + 1) at tick t.
            # Early garbage writes clamp to index 0 and are overwritten by
            # the real microbatch-0 result at t = S - 1 (scan order wins).
            out = jax.lax.dynamic_update_index_in_dim(
                out, h, jnp.maximum(t - (S - 1), 0), 0)
            return (nxt, out), None

        out0 = jnp.zeros_like(xs)
        (_, out), _ = jax.lax.scan(tick, (zero, out0),
                                   jnp.arange(M + S - 1))
        # Only the last stage's buffer holds the pipeline output; one
        # masked psum replicates it across stages.
        out = jnp.where(idx == S - 1, out, jnp.zeros_like(out))
        return jax.lax.psum(out, "stage")

    y = jax.shard_map(
        pipeline, mesh=mesh,
        in_specs=(layer_specs, P(None, "data", None, None),
                  per_row_specs, shared_specs, P()),
        out_specs=P(None, "data", None, None),
        check_vma=False,
    )(stacked, x_mb, per_row_mb, shared, rng)
    return y.reshape((B,) + x.shape[1:])

"""Fully-sharded data parallelism (ZeRO-3 style) over the ``data`` axis.

The reference is single-device (SURVEY.md §2 "Parallelism"); this is a
TPU-native extension built the GSPMD way (scaling-book recipe: annotate
shardings, let XLA insert the collectives):

- Every parameter leaf shards ONE dimension — the largest one divisible
  by the data-axis size — across ``data`` devices; the optimizer state
  mirrors it leaf-by-leaf (optax moment trees embed the param tree, so
  the same shape-driven rule places a moment exactly like its parameter).
  Per-device parameter + optimizer residency drops by ~the data-axis
  size, which is the memory lever for training models whose
  params+moments don't fit one chip replicated (Prodigy keeps THREE
  param-sized slots: exp_avg, exp_avg_sq, p0).
- The forward/backward all-gathers weights per layer on demand (GSPMD
  inserts the gathers over ICI), and an explicit
  ``with_sharding_constraint`` on the gradients makes the batch-grad
  reduction a reduce-scatter instead of all-reduce + re-shard — each
  device then runs the optimizer update only on its own parameter shard
  (exactly ZeRO's update partitioning).
- Composes with the batch sharded on ``data`` (plain DP input feeding is
  unchanged) and with the Pallas kernels: shard_map kernel wrappers
  declare replicated weight operands, so GSPMD gathers shards on entry.

Small leaves (biases, LayerNorm scales, scalars) stay replicated below
``min_size`` — sharding a 768-float vector 8 ways buys nothing and costs
a gather. Enabled by ``training.fsdp: true``; mutually exclusive with
tensor/pipeline parallelism (those own different mesh layouts) and
single-host only (checkpointing reads locally-addressable params).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Leaves smaller than this many elements replicate (gather overhead beats
# the memory win; every matmul weight in the tagger is far above it).
MIN_SHARD_SIZE = 16384


def fsdp_spec(shape, data_size: int, min_size: int = None) -> P:
    """PartitionSpec sharding the largest ``data_size``-divisible dim of
    ``shape`` over ``data`` (replicated if none qualifies or the leaf is
    small). Shape-driven only, so a parameter and its optimizer moments
    (same shape) always land identically."""
    if min_size is None:
        min_size = MIN_SHARD_SIZE
    size = 1
    for d in shape:
        size *= int(d)
    if not shape or size < min_size:
        return P()
    # largest dim wins; ties break to the earliest axis (stable sort)
    order = sorted(range(len(shape)), key=lambda i: -int(shape[i]))
    for i in order:
        if int(shape[i]) % data_size == 0:
            spec = [None] * len(shape)
            spec[i] = "data"
            return P(*spec)
    return P()


def fsdp_shardings(tree, mesh: Mesh, min_size: int = None):
    """Pytree of NamedShardings for params or optimizer state."""
    data_size = dict(mesh.shape)["data"]
    return jax.tree_util.tree_map(
        lambda leaf: NamedSharding(
            mesh, fsdp_spec(getattr(leaf, "shape", ()), data_size,
                            min_size)), tree)


def shard_params_fsdp(tree, mesh: Mesh, min_size: int = None):
    """Place a param/opt-state pytree with ``fsdp_shardings``."""
    return jax.tree_util.tree_map(jax.device_put, tree,
                                  fsdp_shardings(tree, mesh, min_size))

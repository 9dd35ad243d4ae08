"""Tensor parallelism as a config change (SURVEY §2 parallelism design).

The reference has no model parallelism of any kind; the mesh here already
carries a reserved ``model`` axis (`make_mesh(model_parallel=N)`). This
module supplies the Megatron-style parameter shardings that activate it:

- column-parallel (output dim on ``model``): attention q/k/v, FFN in
  projections — heads and FFN channels split across devices;
- row-parallel (input dim on ``model``): attention out, FFN out
  projections — XLA inserts the all-reduce after the partial matmuls;
- the relative-position bucket table shards on its head dim, so the
  [H, T, T] bias and the per-head gate stay device-local;
- everything else (conv feature encoder, norms, BiLSTM, classifier,
  embeddings) is replicated.

No model code changes: semantics are identical (GSPMD partitions the same
graph and inserts collectives over ICI), so this composes with the jitted
train step and the DP batch sharding. Constraints: attention heads and FFN
width must divide the ``model`` axis size. The Pallas flash kernels run
under TP too: they are shard_map-wrapped per shard with heads (and the
bias's head dim) on 'model' (ops/pallas/flash_attention.shard_wrap), so
TP keeps the fused-attention speedups.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Parent-dict names whose "w"/"b" leaves shard column-wise (output dim)
# vs row-wise (input dim, all-reduced afterwards).
_COL = {"q", "k", "v", "ff_in", "fc1", "in"}
_ROW = {"out", "attn_out", "ff_out", "fc2"}


def _spec_for(path, leaf) -> P:
    keys = []
    for k in path:
        keys.append(getattr(k, "key", getattr(k, "name", str(k))))
    if not keys:
        return P()
    name = keys[-1]
    parent = keys[-2] if len(keys) > 1 else ""
    if parent in _COL:
        if name == "w" and leaf.ndim == 2:
            return P(None, "model")
        if name == "b" and leaf.ndim == 1:
            return P("model")
    if parent in _ROW:
        if name == "w" and leaf.ndim == 2:
            return P("model", None)
        return P()
    if parent == "rel_attn_embed" and name == "w":
        return P(None, "model")              # bucket table: heads sharded
    if name == "gru_gate_const":
        return P("model")                    # per-head gate constant
    return P()


def tp_shardings(params, mesh: Mesh):
    """Pytree of NamedShardings implementing Megatron-style TP over the
    mesh's ``model`` axis (params replicated over ``data``)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _spec_for(path, leaf)),
        params)


def shard_params_tp(params, mesh: Mesh):
    """Place a parameter pytree with TP shardings (replicated on 'data')."""
    shardings = tp_shardings(params, mesh)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)

"""Sequence parallelism over the mesh's ``model`` axis (Megatron-SP style).

The reference is single-device (SURVEY.md §2 "Parallelism"), so this is a
TPU-native extension, not a port. Design (scaling-book recipe: annotate
shardings, let GSPMD insert the collectives):

- Encoder activations ``[B, T, H]`` are constrained to
  ``P('data', 'model', None)`` at layer boundaries — the *time* axis is
  sharded over the same device axis tensor parallelism uses, exactly like
  Megatron-LM's sequence parallelism (Korthikanti et al., 2022): the
  norm/residual/dropout regions between matmuls hold only ``T/mp`` frames
  per device.
- Every linear contracts over the hidden axis, so T-sharded activations
  feed them with no communication at all; only attention (whose scores
  couple all T positions) and the convolutional position embedding (halo)
  need cross-shard data, and GSPMD inserts the minimal all-gathers /
  collective-permutes over ICI automatically.
- Composes with TP: with ``model_parallel > 1`` the matmul weights are
  Megatron-sharded (parallel/tp.py) and the activations between them are
  sequence-sharded, which is the standard TP+SP pairing. With
  ``model_parallel == 1`` the constraint is a no-op (axis size 1) and
  ``sp_active`` reports False so no constraint is even traced.

Why it matters here: WavLM at 30 s chunks runs T=1499 with a shared
``[H, T, T]`` position bias and [B, T, H] residual streams; sequence
sharding divides the per-device activation footprint of everything
*outside* attention by the model-axis size, which is the lever for longer
chunk lengths / larger models per chip.

Enabled by ``training.sequence_parallel: true`` (train) or
``model.sequence_parallel: true`` (serving session); threaded through
``apply_tagger(..., sequence_parallel=True)``.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def sp_active(mesh, sequence_parallel: bool) -> bool:
    """True iff sequence-parallel constraints should be traced: the flag is
    set AND a mesh with a >1 ``model`` axis is live."""
    return (bool(sequence_parallel) and mesh is not None
            and dict(mesh.shape).get("model", 1) > 1)


def shard_time(x: jax.Array, mesh: Mesh) -> jax.Array:
    """Constrain a ``[B, T, ...]`` activation to shard T over ``model``
    (batch stays on ``data``). Uneven T is handled by GSPMD padding."""
    spec = P("data", "model", *([None] * (x.ndim - 2)))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

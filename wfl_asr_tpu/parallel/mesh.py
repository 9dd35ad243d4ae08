"""Device mesh + sharding helpers (data-parallel first).

The reference is strictly single-device (SURVEY.md §2 "Parallelism": no
torch.distributed/DDP/NCCL anywhere). The TPU-native scaling strategy is
XLA-collective data parallelism over an ICI mesh:

- ``make_mesh`` builds a ``jax.sharding.Mesh`` over all (or N) devices with
  axes ``('data', 'model')``; model=1 today, reserved so tensor-parallel
  sharding is a config change rather than a rewrite.
- Parameters are replicated (`P()`), batches sharded on ``data`` along the
  leading axis.
- Nothing else changes: the jitted train step's loss mean and Prodigy's
  global scalar reductions keep their global semantics — under jit with
  sharded inputs XLA inserts the psums over ICI automatically.

Batch-size divisibility: shard_batch pads the leading axis up to a multiple
of the data-axis size (CE ignores −100 labels and zero-audio rows contribute
zero-valid offset targets, so padding rows are loss-neutral — but callers
should prefer divisible batch sizes to avoid wasted compute).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Environment variables whose presence marks a multi-host/multi-slice launch
# (SURVEY.md §2 names jax.distributed.initialize as the communication-backend
# equivalent of the backends the reference never had). JAX's own cluster
# auto-detection handles the coordinator handshake once we decide to call it.
# JAX-specific coordinator vars: their presence is an unambiguous user
# request for a cluster, so init failures must propagate.
_EXPLICIT_CLUSTER_VARS = (
    "JAX_COORDINATOR_ADDRESS",        # explicit JAX coordinator
    "MEGASCALE_COORDINATOR_ADDRESS",  # multi-slice (DCN) launches
)

_dist_initialized = False


def _multihost_signal(env):
    """None (single-host) | "explicit" (user-configured cluster; init
    failures propagate) | "heuristic" (ambient metadata; failures degrade
    to single-process with a warning)."""
    if any(v in env for v in _EXPLICIT_CLUSTER_VARS):
        return "explicit"
    # JAX_PROCESS_COUNT=1 is a single-process launch, not a cluster.
    try:
        if int(env.get("JAX_PROCESS_COUNT", "1")) > 1:
            return "explicit"
    except ValueError:
        pass
    # The generic COORDINATOR_ADDRESS name is used by other tools too
    # (sidecars, unrelated launchers) — treat as a hint, not a command.
    if "COORDINATOR_ADDRESS" in env:
        return "heuristic"
    # GCE/GKE TPU pod metadata: counts only when it actually names more
    # than one worker — single-host platforms (this repo's axon relay
    # included) set TPU_WORKER_HOSTNAMES=localhost, which must not trip
    # the guard (jax.distributed.initialize then dies looking for a
    # coordinator address).
    if "," in env.get("TPU_WORKER_HOSTNAMES", ""):
        return "heuristic"
    return None


def maybe_initialize_distributed(env=None, _initialize=None) -> bool:
    """Call ``jax.distributed.initialize()`` iff standard cluster env vars
    mark a multi-host TPU pod / multi-slice launch, exactly once. No-op on
    single-host runs — the common case in this repository, where only one
    chip (or a forced-CPU mesh) is visible. Returns True when
    initialization ran.

    ``env``/``_initialize`` are injectable for unit tests (multi-host can't
    be integration-tested on a single-chip box)."""
    global _dist_initialized
    env = os.environ if env is None else env
    if _dist_initialized:
        return False
    signal = _multihost_signal(env)
    if signal is None:
        return False
    init = _initialize if _initialize is not None else \
        jax.distributed.initialize
    explicit = signal == "explicit"
    # Generic (non-SLURM/MPI/GKE) launchers: jax's cluster auto-detection
    # has no plain env fallback for num_processes/process_id, so pass them
    # through explicitly when the launcher sets JAX_PROCESS_COUNT /
    # JAX_PROCESS_ID (coordinator_address comes from JAX_COORDINATOR_ADDRESS,
    # which jax itself reads).
    kwargs = {}
    if "JAX_PROCESS_COUNT" in env and "JAX_PROCESS_ID" in env:
        try:
            kwargs = {"num_processes": int(env["JAX_PROCESS_COUNT"]),
                      "process_id": int(env["JAX_PROCESS_ID"])}
        except ValueError:
            kwargs = {}
    try:
        init(**kwargs)
    except RuntimeError as e:
        # Only a double-init is benign. Any other RuntimeError (coordinator
        # handshake/connection failure) must propagate: swallowing it would
        # let N hosts proceed as N independent single-process trainings
        # with no gradient sync — silently wrong results.
        if "already initialized" not in str(e):
            raise
    except ValueError as e:
        if explicit:
            # The user explicitly pointed at a coordinator; an unresolvable
            # cluster is a configuration error, and degrading would be the
            # same silent N-independent-trainings hazard as above.
            raise
        # Heuristic trip only (TPU_WORKER_HOSTNAMES listing several hosts,
        # e.g. a metadata server mirroring another pod): degrade to
        # single-process rather than killing the run. Latch so the warning
        # prints once, not per _get_session call.
        print(f"[WARN] jax.distributed.initialize skipped: {e}")
        _dist_initialized = True
        return False
    _dist_initialized = True
    return True


def make_mesh(num_devices: Optional[int] = None, model_parallel: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if num_devices is not None:
        devices = devices[:num_devices]
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel="
                         f"{model_parallel}")
    grid = np.array(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, ("data", "model"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicate(tree, mesh: Mesh):
    """Replicate a parameter/state pytree across the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)


def shard_batch(batch_tree, mesh: Mesh, pad_value_map=None):
    """Shard each array leaf on the leading (batch) axis over ``data``; pads the
    leading axis to a multiple of the data-axis size when needed.

    ``pad_value_map``: optional dict key→pad value (e.g. labels → −100);
    otherwise zeros.
    """
    data_size = mesh.shape["data"]
    pcount = jax.process_count()

    def put(key, x):
        x = np.asarray(x)
        if pcount > 1:
            # Multi-host: `x` holds THIS process's rows of the global
            # batch (the train driver shards file indices per process and
            # uses a per-process batch size). Assemble the global sharded
            # array from process-local data; no padding here — multi-host
            # runs require divisible batches (drop_last is forced).
            sharding = batch_sharding(mesh, x.ndim)
            global_shape = (x.shape[0] * pcount,) + x.shape[1:]
            return jax.make_array_from_process_local_data(
                sharding, x, global_shape)
        b = x.shape[0]
        rem = b % data_size
        if rem:
            pad = data_size - rem
            fill = (pad_value_map or {}).get(key, 0)
            pad_block = np.full((pad,) + x.shape[1:], fill, x.dtype)
            x = np.concatenate([x, pad_block], axis=0)
        return jax.device_put(x, batch_sharding(mesh, x.ndim))

    if isinstance(batch_tree, dict):
        return {k: put(k, v) for k, v in batch_tree.items()}
    return jax.tree_util.tree_map(lambda x: put(None, x), batch_tree)

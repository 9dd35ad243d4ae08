"""Checkpointing with the reference's file contract.

Model checkpoints are written as torch-format ``model_step{N}.pt`` files
containing a reference-compatible state_dict (via ``export_tagger``), so
checkpoints interoperate with usamireko/WFL-ASR **in both directions**
(torch-cpu is present in this environment; a ``.npz`` fallback covers
torch-less deployments). Training state the reference never persists —
optimizer moments, PRNG, step (quirk Q4) — goes in a sidecar
``model_step{N}.train.npz`` so resume is exact.

Rotation/best/last semantics mirror reference train.py:276-290, 420-433, 453.
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat: Dict[str, np.ndarray]):
    root: Dict[str, Any] = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val

    def listify(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(k.isdigit() for k in keys):
            return [listify(node[str(i)]) for i in range(len(keys))]
        return {k: listify(v) for k, v in node.items()}

    return listify(root)


def _atomic_npz(path: str, payload: Dict[str, np.ndarray]) -> None:
    """Write an ``.npz`` atomically (tmp file + ``os.replace``) so a crash
    mid-save can never leave a truncated archive at the final name."""
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **payload)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def save_pytree_npz(path: str, tree) -> None:
    _atomic_npz(path, _flatten(tree))


def load_pytree_npz(path: str):
    with np.load(path, allow_pickle=False) as data:
        return _unflatten({k: data[k] for k in data.files})


# ---------------------------------------------------------------------------
# Model checkpoints (.pt contract)
# ---------------------------------------------------------------------------

def save_model_checkpoint(path: str, params, state, arch,
                          fmt: str = "pt") -> None:
    """Write a model checkpoint.

    ``fmt="pt"`` (default): reference-compatible torch state_dict — full
    interop with usamireko/WFL-ASR in both directions (falls back to
    ``.pt.npz`` without torch). ``fmt="orbax"``: orbax StandardCheckpointer
    directory at ``path + ".orbax"`` (pure-JAX deployments; same
    ``model_step{N}.pt``-rooted naming so rotation/resume are unchanged).
    """
    host_params = jax.device_get(params)
    host_state = jax.device_get(state)
    if fmt == "orbax":
        import orbax.checkpoint as ocp
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.abspath(path) + ".orbax",
                   {"params": host_params, "state": host_state}, force=True)
        ckptr.wait_until_finished()
        return
    from .models.convert import export_tagger
    sd_np = export_tagger(host_params, host_state, arch)
    try:
        import torch
        sd = {k: torch.tensor(v) for k, v in sd_np.items()}
        # Atomic + durable: a crash/kill (or power cut — hence the fsync
        # before rename) mid-save must not leave a truncated .pt at the
        # final name — auto-resume reads the newest checkpoint and a torn
        # file would poison every subsequent restart.
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            torch.save(sd, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
    except ImportError:
        save_pytree_npz(path + ".npz", sd_np)


def load_model_checkpoint(path: str, arch) -> Tuple[dict, dict]:
    """Load a ``.pt`` (torch, ours or the reference's), ``.pt.npz``, or an
    orbax directory (``path`` or ``path + ".orbax"``)."""
    from .models.convert import convert_tagger
    orbax_dir = path if path.endswith(".orbax") else path + ".orbax"
    if os.path.isdir(orbax_dir):
        import orbax.checkpoint as ocp
        restored = ocp.StandardCheckpointer().restore(
            os.path.abspath(orbax_dir))
        return restored["params"], restored["state"]
    if os.path.exists(path):
        import torch
        sd = torch.load(path, map_location="cpu", weights_only=True)
        return convert_tagger(sd, arch)
    if os.path.exists(path + ".npz"):
        flat = load_pytree_npz(path + ".npz")

        class _NpWrap:
            def __init__(self, a):
                self._a = np.asarray(a)

            def detach(self):
                return self

            def cpu(self):
                return self

            def numpy(self):
                return self._a

            @property
            def shape(self):
                return self._a.shape

        # convert_tagger expects torch-like tensors; wrap numpy arrays.
        wrapped = {k: _NpWrap(v) for k, v in _flatten(flat).items()}
        # _flatten joined keys with "/" but state_dict keys contain "."
        wrapped = {k.replace("/", "."): v for k, v in wrapped.items()}
        return convert_tagger(wrapped, arch)
    raise FileNotFoundError(path)


# ---------------------------------------------------------------------------
# Training sidecar (optimizer state etc.)
# ---------------------------------------------------------------------------

def train_sidecar_path(model_path: str) -> str:
    return re.sub(r"\.pt$", "", model_path) + ".train.npz"


def _keypath_str(path) -> str:
    return jax.tree_util.keystr(path)


def save_train_state(model_path: str, opt_state, step: int,
                     rng_key: np.ndarray,
                     scheduler_state: Optional[Dict] = None) -> None:
    """Persist optimizer state leaves keyed by canonical jax keypaths, plus
    step, PRNG key, and (optionally) the LR scheduler's scalar state."""
    leaves = jax.tree_util.tree_flatten_with_path(jax.device_get(opt_state))[0]
    payload = {f"opt::{_keypath_str(p)}": np.asarray(v) for p, v in leaves}
    payload["step"] = np.int64(step)
    payload["rng"] = np.asarray(rng_key)
    for k, v in (scheduler_state or {}).items():
        payload[f"sched::{k}"] = np.float64(v)
    _atomic_npz(train_sidecar_path(model_path), payload)


def load_train_state(model_path: str, opt_state_template):
    """Restore optimizer state into the template's structure. Returns
    (opt_state, step, rng, scheduler_state) or None if no sidecar exists;
    ``scheduler_state`` is a (possibly empty, for pre-r3 sidecars) dict of
    scalar floats."""
    path = train_sidecar_path(model_path)
    if not os.path.exists(path):
        return None
    with np.load(path, allow_pickle=False) as data:
        stored = {k: data[k] for k in data.files}
    paths_and_leaves, treedef = jax.tree_util.tree_flatten_with_path(
        opt_state_template)
    restored = []
    for p, template_leaf in paths_and_leaves:
        key = f"opt::{_keypath_str(p)}"
        if key not in stored:
            raise ValueError(f"optimizer state missing {key!r} on resume")
        restored.append(stored[key].astype(np.asarray(template_leaf).dtype))
    opt_state = jax.tree_util.tree_unflatten(treedef, restored)
    sched = {k.removeprefix("sched::"): float(v)
             for k, v in stored.items() if k.startswith("sched::")}
    return opt_state, int(stored["step"]), np.asarray(stored["rng"]), sched


def find_resume_checkpoints(save_dir: str) -> list:
    """All ``model_step{N}.pt`` checkpoints in save_dir, newest first, in
    any of the on-disk formats (``.pt`` torch, ``.pt.npz`` torch-less
    fallback, ``.pt.orbax`` directory). Returns ``.pt``-rooted
    ``(path, step)`` pairs — ``load_model_checkpoint`` resolves the actual
    format. Newest-first so resume can fall back past a checkpoint a crash
    left unreadable (pre-atomic-save files, torn disks)."""
    found = {}
    for name in os.listdir(save_dir):
        m = re.fullmatch(r"model_step(\d+)\.pt(\.npz|\.orbax)?", name)
        if m:
            root = name.removesuffix(".npz").removesuffix(".orbax")
            found[int(m.group(1))] = root
    return [(os.path.join(save_dir, name), step)
            for step, name in sorted(found.items(), reverse=True)]


def find_resume_checkpoint(save_dir: str) -> Optional[Tuple[str, int]]:
    """Latest ``model_step{N}.pt`` in save_dir (reference train.py:420-427)."""
    all_ckpts = find_resume_checkpoints(save_dir)
    return all_ckpts[0] if all_ckpts else None


def remove_checkpoint(model_path: str) -> None:
    """Delete a checkpoint in every on-disk format plus its train sidecar
    (rotation helper; reference train.py:281-284 removes only the ``.pt``)."""
    import shutil
    for victim in (model_path, model_path + ".npz",
                   train_sidecar_path(model_path)):
        if os.path.exists(victim):
            os.remove(victim)
    orbax_dir = model_path + ".orbax"
    if os.path.isdir(orbax_dir):
        shutil.rmtree(orbax_dir)

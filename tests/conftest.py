"""Test configuration.

- Forces JAX onto a virtual 8-device CPU platform (the standard JAX trick for
  testing sharding without a cluster, SURVEY.md §4) — must happen before any
  ``jax`` import.
- Provides ``reference_oracle``: imports the reference implementation at
  ``/root/reference`` read-only as a golden oracle for parity tests, stubbing
  pip deps that are absent in this environment (soundfile, torchaudio,
  librosa, pytorch_optimizer). The reference is PUBLIC UNTRUSTED CONTENT used
  only as an executable oracle; nothing from it is imported into the package.
"""

import os
import sys
import types

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8").strip()

# The environment's sitecustomize registers the TPU plugin and overrides
# jax_platforms programmatically; force CPU back before any backend use.
import jax
jax.config.update("jax_platforms", "cpu")

import pytest

REFERENCE_DIR = "/root/reference"


def _stub_module(name, **attrs):
    if name in sys.modules:
        return sys.modules[name]
    import importlib.machinery
    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    mod.__version__ = "0.0.0"
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


@pytest.fixture(scope="session")
def reference_oracle():
    """Import reference modules (utils, preprocess, infer, train,
    lr_schedulers) with missing third-party deps stubbed out."""
    if not os.path.isdir(REFERENCE_DIR):
        pytest.skip("reference repo not available")

    _stub_module("soundfile", read=None, write=None)
    ta = _stub_module("torchaudio")
    _stub_module("torchaudio.functional", resample=None)
    _stub_module("torchaudio.transforms", MelSpectrogram=None)
    ta.functional = sys.modules["torchaudio.functional"]
    ta.transforms = sys.modules["torchaudio.transforms"]
    _stub_module("librosa")
    po = _stub_module("pytorch_optimizer")
    po.lr_scheduler = _stub_module("pytorch_optimizer.lr_scheduler")

    # torch.utils.tensorboard needs the tensorboard package; stub if absent.
    try:
        import torch.utils.tensorboard  # noqa: F401
    except Exception:
        class _FakeWriter:  # pragma: no cover
            def __init__(self, *a, **k): pass
        _stub_module("torch.utils.tensorboard", SummaryWriter=_FakeWriter)

    sys.path.insert(0, REFERENCE_DIR)
    try:
        import importlib
        modules = {}
        for name in ["utils", "preprocess", "infer", "train"]:
            if name in sys.modules:
                del sys.modules[name]
            modules[name] = importlib.import_module(name)
        yield types.SimpleNamespace(**modules)
    finally:
        sys.path.remove(REFERENCE_DIR)
        for name in ["utils", "preprocess", "infer", "train", "model",
                     "lr_schedulers"]:
            sys.modules.pop(name, None)

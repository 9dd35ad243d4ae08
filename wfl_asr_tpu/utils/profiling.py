"""Tracing / profiling hooks (SURVEY.md §5: absent in the reference; the TPU
build adds ``jax.profiler`` traces plus step-time / RTFx counters).

- ``maybe_trace``: context manager that captures a jax profiler trace into
  ``$WFL_PROFILE_DIR`` when that env var is set (viewable in TensorBoard or
  xprof); no-op otherwise.
- ``StepTimer``: lightweight step-time EMA + RTFx accounting for training
  and benchmark loops.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Optional


@contextlib.contextmanager
def maybe_trace(name: str = "wfl"):
    profile_dir = os.environ.get("WFL_PROFILE_DIR")
    if not profile_dir:
        yield
        return
    import jax
    out = os.path.join(profile_dir, name)
    os.makedirs(out, exist_ok=True)
    with jax.profiler.trace(out):
        yield
    print(f"[profile] trace written to {out}")


class StepTimer:
    """EMA step time + cumulative audio-seconds → RTFx."""

    def __init__(self, ema: float = 0.9):
        self.ema = ema
        self.avg: Optional[float] = None
        self.audio_seconds = 0.0
        self.wall_seconds = 0.0
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, audio_seconds: float = 0.0) -> float:
        if self._t0 is None:
            raise RuntimeError("StepTimer.stop() without a matching start()")
        dt = time.perf_counter() - self._t0
        self._t0 = None  # catch unpaired stop() calls
        self.avg = dt if self.avg is None else \
            self.ema * self.avg + (1 - self.ema) * dt
        self.audio_seconds += audio_seconds
        self.wall_seconds += dt
        return dt

    @property
    def rtfx(self) -> float:
        return self.audio_seconds / self.wall_seconds \
            if self.wall_seconds > 0 else 0.0

    @property
    def steps_per_sec(self) -> float:
        return 1.0 / self.avg if self.avg else 0.0

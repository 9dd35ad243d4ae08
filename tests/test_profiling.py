"""Profiling utilities: StepTimer accounting and the trace context no-op."""

import time

from wfl_asr_tpu.utils.profiling import StepTimer, maybe_trace


def test_step_timer_rtfx():
    t = StepTimer(ema=0.5)
    for _ in range(3):
        t.start()
        time.sleep(0.01)
        t.stop(audio_seconds=1.0)
    assert t.avg is not None and t.avg >= 0.009
    assert 0 < t.rtfx < 120  # ~1s audio per 10ms wall
    assert t.steps_per_sec > 0


def test_maybe_trace_noop(monkeypatch):
    monkeypatch.delenv("WFL_PROFILE_DIR", raising=False)
    with maybe_trace("x"):
        pass  # no profiler without the env var

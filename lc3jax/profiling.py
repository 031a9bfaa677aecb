"""Profiling hooks (the reference profiles with flamegraphs + SysTick
timing comments, SURVEY.md section 5; the TPU equivalent is xprof traces
plus per-step timers)."""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/lc3jax-trace"):
    """Capture an xprof trace around a region:

        with lc3jax.profiling.trace("/tmp/tr"):
            step(state, frames)
    View with tensorboard / xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Blocking per-step wall timer for quick kernel triage."""

    def __init__(self):
        self.times_ms: list[float] = []

    @contextlib.contextmanager
    def measure(self, result_getter=None):
        t0 = time.perf_counter()
        yield
        if result_getter is not None:
            jax.block_until_ready(result_getter())
        self.times_ms.append((time.perf_counter() - t0) * 1e3)

    @property
    def median_ms(self) -> float:
        s = sorted(self.times_ms)
        return s[len(s) // 2] if s else 0.0

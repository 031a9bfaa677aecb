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


def _device_module_events(trace_dir: str):
    """Parse an xprof trace dir into the device lane's XLA-module events:
    a sorted list of (start_us, dur_us) on the device's own clock."""
    import glob
    import gzip
    import json
    import os

    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        return []
    with gzip.open(max(paths, key=os.path.getmtime)) as f:
        data = json.load(f)
    ev = data["traceEvents"]
    pids = {e["pid"]: e["args"]["name"] for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev = next((p for p, n in pids.items() if "TPU" in n or "GPU" in n), None)
    if dev is None:  # CPU backend: fall back to host lane totals
        dev = next((p for p, n in pids.items() if "CPU" in n), None)
    tids = {(e["pid"], e["tid"]): e["args"]["name"] for e in ev
            if e.get("ph") == "M" and e.get("name") == "thread_name"}
    mod_tid = next((t for (p, t), n in tids.items()
                    if p == dev and n == "XLA Modules"), None)
    if mod_tid is None:
        return []
    return sorted((e["ts"], e["dur"]) for e in ev if e.get("ph") == "X"
                  and e["pid"] == dev and e["tid"] == mod_tid)


def _fence(tree) -> None:
    """Synchronize with the device queue via a real (tiny) D2H fetch —
    on the axon relay block_until_ready does NOT fence execution."""
    import numpy as _np

    jax.block_until_ready(tree)
    leaves = jax.tree_util.tree_leaves(tree)
    if leaves:
        _np.asarray(jax.device_get(leaves[-1].ravel()[:1]))


def device_loop_span_ms(run_fn, trace_dir: str | None = None) -> float:
    """Device-clock wall span of an arbitrary host-driven loop.

    Fences the device queue, opens a trace, calls `run_fn()` (which must
    return a jax tree whose last leaf is from the loop's final step), fences
    again inside the trace, and returns last-event-end minus
    first-event-start over the device lane's XLA modules, in ms.

    Unlike device_step_ms (median per-module duration = pure device cost),
    the SPAN includes device idle gaps where it waited on the host — which
    is exactly the number for host+device pipelines (e.g.
    serving.BatchDecoder.decode_stream(pipeline=True)): frames/span is the
    real pipelined throughput, measured on the device's own clock, immune
    to the axon tunnel's async-dispatch and D2H wall-time noise."""
    import shutil
    import tempfile
    import time as _time

    _fence(jax.device_put(0))  # drain anything queued before the window
    own_dir = trace_dir is None
    if own_dir:
        trace_dir = tempfile.mkdtemp(prefix="lc3jax-devspan-")
    try:
        jax.profiler.start_trace(trace_dir)
        out = run_fn()
        _fence(out)
        _time.sleep(1.5)  # let the collector drain
        jax.profiler.stop_trace()
        evs = _device_module_events(trace_dir)
        if not evs:
            return 0.0
        start = min(ts for ts, _ in evs)
        end = max(ts + dur for ts, dur in evs)
        return (end - start) / 1e3
    finally:
        if own_dir:
            shutil.rmtree(trace_dir, ignore_errors=True)


def device_step_ms(step_fn, init_carry, step_args, steps: int = 10,
                   trace_dir: str | None = None) -> float:
    """Ground-truth per-step device time from a profiler trace.

    Runs `carry = step_fn(carry, *step_args)[0]` (step_fn returns
    (carry, out)) `steps` times under jax.profiler.trace and returns the
    median XLA-module duration in ms, measured on the device's own clock.

    This is the only trustworthy timing on hosts where dispatch is
    asynchronous and jax.block_until_ready does not fence execution (the
    axon TPU tunnel: host wall-clock under-reports a 1009 ms step as
    0.06 ms). On a normal backend it simply reads what xprof would show.
    """
    import glob
    import gzip
    import json
    import os
    import shutil
    import tempfile
    import time as _time

    import numpy as _np

    carry, out = step_fn(init_carry, *step_args)  # warm compile
    jax.block_until_ready((carry, out))
    # Fence with a real (tiny) D2H fetch: on the axon relay
    # block_until_ready does NOT fence execution, so without this the
    # trace window can open while the warm-up step (or a previous
    # caller's queued work) is still executing on device — measured as
    # 26x-inflated module durations in the round-4 fused sweep. A fetch
    # is the one operation that synchronizes with the device queue.
    leaves = jax.tree_util.tree_leaves((carry, out))
    if leaves:
        _np.asarray(jax.device_get(leaves[-1].ravel()[:1]))
    own_dir = trace_dir is None
    if own_dir:
        trace_dir = tempfile.mkdtemp(prefix="lc3jax-devtime-")
    try:
        jax.profiler.start_trace(trace_dir)
        carry = init_carry
        for _ in range(steps):
            carry, out = step_fn(carry, *step_args)
        jax.block_until_ready((carry, out))
        leaves = jax.tree_util.tree_leaves((carry, out))
        if leaves:  # same fence: all timed steps must finish inside the trace
            _np.asarray(jax.device_get(leaves[-1].ravel()[:1]))
        _time.sleep(1.5)  # let the collector drain
        jax.profiler.stop_trace()

        paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                          recursive=True)
        if not paths:
            return 0.0
        with gzip.open(max(paths, key=os.path.getmtime)) as f:
            data = json.load(f)
        ev = data["traceEvents"]
        pids = {e["pid"]: e["args"]["name"] for e in ev
                if e.get("ph") == "M" and e.get("name") == "process_name"}
        dev = next((p for p, n in pids.items() if "TPU" in n or "GPU" in n), None)
        if dev is None:  # CPU backend: fall back to host lane totals
            dev = next((p for p, n in pids.items() if "CPU" in n), None)
        tids = {(e["pid"], e["tid"]): e["args"]["name"] for e in ev
                if e.get("ph") == "M" and e.get("name") == "thread_name"}
        mod_tid = next((t for (p, t), n in tids.items()
                        if p == dev and n == "XLA Modules"), None)
        if mod_tid is None:
            return 0.0
        durs = sorted(e["dur"] for e in ev if e.get("ph") == "X"
                      and e["pid"] == dev and e["tid"] == mod_tid)
        if not durs:
            return 0.0
        return durs[len(durs) // 2] / 1e3
    finally:
        if own_dir:
            shutil.rmtree(trace_dir, ignore_errors=True)


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

#!/usr/bin/env python3
"""Ground-truth device profiling via jax.profiler traces.

Host wall-clock is useless on this container's axon TPU tunnel:
dispatches are buffered asynchronously and jax.block_until_ready returns
without waiting for device execution (see CLAUDE.md). The device-side
trace, however, records real module/op durations from the TPU's own
clock. This tool runs N steps of a chosen path under jax.profiler.trace
and prints per-step module duration plus the op-level breakdown.

Usage: python tools/tpu_profile.py [decode|encode|fused] [n_streams] [steps]
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_trace(kind: str, n_streams: int, steps: int, trace_dir: str) -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/lc3jax-xla-cache-tpu")
    import functools

    import numpy as np

    from lc3jax.config import FrameDuration, Lc3Config
    from lc3jax.coding import native
    from lc3jax.ref.encoder import Lc3Encoder

    cfg = Lc3Config.new(48000, FrameDuration.MS10)
    nbytes = 150
    enc = Lc3Encoder(1, cfg.n_ms, cfg.fs)
    t = np.arange(cfg.nf) / cfg.fs
    pcm = (8000 * np.sin(2 * np.pi * 220 * t)).astype(np.int16)
    payload = bytes(enc.encode_frame(0, pcm, nbytes))
    batch = np.tile(np.frombuffer(payload, np.uint8), (n_streams, 1))

    if kind in ("decode", "decode_pallas"):
        from lc3jax.dsp.decoder import decode_step, decoder_init

        frames = jax.device_put(native.parse_frames_native(cfg, batch))
        step = jax.jit(
            functools.partial(decode_step, cfg, nbytes * 8,
                              use_pallas=kind == "decode_pallas")
        )
        state = decoder_init(cfg, n_streams)
        st, out = step(state, frames)
        jax.block_until_ready((st, out))
        jax.profiler.start_trace(trace_dir)
        st = state
        for _ in range(steps):
            st, out = step(st, frames)
        jax.block_until_ready((st, out))
    elif kind == "encode":
        from lc3jax.dsp.encoder import encode_step, encoder_init

        pcm_b = jax.device_put(np.tile(pcm, (n_streams, 1)))
        step = jax.jit(functools.partial(encode_step, cfg, nbytes))
        state = encoder_init(cfg, n_streams)
        st, out = step(state, pcm_b)
        jax.block_until_ready((st, out))
        jax.profiler.start_trace(trace_dir)
        st = state
        for _ in range(steps):
            st, out = step(st, pcm_b)
        jax.block_until_ready((st, out))
    elif kind == "fused":
        from lc3jax.coding.device import make_decode_bytes_step
        from lc3jax.dsp.decoder import decoder_init

        bytes_dev = jax.device_put(batch)
        step = make_decode_bytes_step(cfg, nbytes)
        state = decoder_init(cfg, n_streams)
        st, out = step(state, bytes_dev)
        jax.block_until_ready((st, out))
        jax.profiler.start_trace(trace_dir)
        st = state
        for _ in range(steps):
            st, out = step(st, bytes_dev)
        jax.block_until_ready((st, out))
    else:
        raise SystemExit(f"unknown kind {kind}")
    time.sleep(2)  # let the trace collector drain
    jax.profiler.stop_trace()


def analyze(trace_dir: str, steps: int, n_streams: int) -> None:
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True)
    if not paths:
        raise SystemExit("no trace produced")
    with gzip.open(max(paths, key=os.path.getmtime)) as f:
        data = json.load(f)
    ev = data["traceEvents"]
    pids = {
        e["pid"]: e["args"]["name"]
        for e in ev
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    dev_pid = next((p for p, n in pids.items() if "TPU" in n), None)
    if dev_pid is None:
        raise SystemExit(f"no TPU lane in trace (lanes: {pids})")
    tids = {
        (e["pid"], e["tid"]): e["args"]["name"]
        for e in ev
        if e.get("ph") == "M" and e.get("name") == "thread_name"
    }
    mod_tid = next(t for (p, t), n in tids.items() if p == dev_pid and n == "XLA Modules")
    op_tid = next(t for (p, t), n in tids.items() if p == dev_pid and n == "XLA Ops")

    mods = sorted(
        (e for e in ev if e.get("ph") == "X" and e["pid"] == dev_pid and e["tid"] == mod_tid),
        key=lambda e: e["ts"],
    )
    durs = sorted(e["dur"] for e in mods)
    med = durs[len(durs) // 2] / 1e3
    rtf = n_streams * 10.0 / med  # 10 ms frames
    print(f"modules: {len(mods)} (expected {steps}); median {med:.3f} ms/step "
          f"-> {rtf:,.0f}x realtime @ S={n_streams}")

    agg: dict = collections.defaultdict(lambda: [0, 0])
    for e in ev:
        if e.get("ph") == "X" and e["pid"] == dev_pid and e["tid"] == op_tid:
            name = re.sub(r"\.\d+$", "", e["name"])
            agg[name][0] += e["dur"]
            agg[name][1] += 1
    print("top ops (ms/step, n/step):")
    for name, (d, n) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:14]:
        print(f"  {d / 1e3 / steps:9.3f} ms  n={n // steps:6d}  {name[:70]}")


def main() -> None:
    kind = sys.argv[1] if len(sys.argv) > 1 else "decode"
    n_streams = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    trace_dir = f"/tmp/lc3jax-trace-{kind}-{n_streams}"
    os.system(f"rm -rf {trace_dir}")
    run_trace(kind, n_streams, steps, trace_dir)
    analyze(trace_dir, steps, n_streams)


if __name__ == "__main__":
    main()

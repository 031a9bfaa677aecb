#!/usr/bin/env python3
"""Standalone host parser/packer micro-benchmark (no TPU, no jax).

Times the native C++ batch parse/pack exactly as bench.py does (same mixed
content, best-of-N) but importable and fast, for A/B tuning of
native/lc3_bitstream.cc (lane counts, prefetch, SIMD variants).

Usage: python tools/host_parse_bench.py [n_streams] [iters]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_streams = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 12

    from lc3jax.coding import native
    from lc3jax.config import FrameDuration, Lc3Config
    from lc3jax.ref.encoder import Lc3Encoder

    assert native.available(), "build native/ first (sh native/build.sh)"

    cfg = Lc3Config.new(48000, FrameDuration.MS10)
    nbytes = 150
    frame_seconds = 0.01

    rng = np.random.default_rng(0)
    enc = Lc3Encoder(4, cfg.n_ms, cfg.fs)
    t = np.arange(cfg.nf) / cfg.fs
    contents = [
        (8000 * np.sin(2 * np.pi * 220 * t)).astype(np.int16),
        (3000 * np.sin(2 * np.pi * 997 * t)
         + 500 * rng.standard_normal(cfg.nf)).astype(np.int16),
        (1500 * rng.standard_normal(cfg.nf)).astype(np.int16),
        (6000 * np.sin(2 * np.pi * 97 * t)).astype(np.int16),
    ]
    payloads = [bytes(enc.encode_frame(ch, pcm, nbytes))
                for ch, pcm in enumerate(contents)]
    batch = np.frombuffer(
        b"".join(payloads[s % 4] for s in range(n_streams)), np.uint8
    ).reshape(n_streams, nbytes)

    native.parse_frames_native(cfg, batch[:8])  # warm
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        native.parse_frames_native(cfg, batch, n_threads=os.cpu_count() or 1)
        best = min(best, time.perf_counter() - t0)
    rtf = n_streams * frame_seconds / best
    per_frame_us = best / n_streams * 1e6
    print(f"parse: best {best*1e3:.2f} ms for {n_streams} frames "
          f"({per_frame_us:.2f} us/frame, {rtf:.0f}x realtime/core, "
          f"loadavg {os.getloadavg()[0]:.2f})")


if __name__ == "__main__":
    main()

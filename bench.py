#!/usr/bin/env python3
"""Throughput benchmark: batched LC3 decode on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric: aggregate realtime decode factor per chip at 48 kHz / 10 ms mono
(device DSP path: parsed bitstream tensors -> PCM). Baseline is the
reference implementation's published ~720x realtime on one Intel i7-6700K
core (reference README.md:124-125, see BASELINE.md).
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax

    from lc3jax.config import FrameDuration, Lc3Config
    from lc3jax.coding.host import parse_frames
    from lc3jax.dsp.decoder import decoder_init, make_decode_step
    from lc3jax.ref.encoder import Lc3Encoder

    cfg = Lc3Config.new(48000, FrameDuration.MS10)
    nbytes = 150
    n_streams = 2048
    frame_seconds = 0.01

    # build a realistic frame batch: distinct tonal/noise content per group
    rng = np.random.default_rng(0)
    enc = Lc3Encoder(4, cfg.n_ms, cfg.fs)
    t = np.arange(cfg.nf) / cfg.fs
    contents = [
        (8000 * np.sin(2 * np.pi * 220 * t)).astype(np.int16),
        (3000 * np.sin(2 * np.pi * 997 * t) + 500 * rng.standard_normal(cfg.nf)).astype(np.int16),
        (1500 * rng.standard_normal(cfg.nf)).astype(np.int16),
        (6000 * np.sin(2 * np.pi * 97 * t)).astype(np.int16),
    ]
    payloads = [bytes(enc.encode_frame(ch, pcm, nbytes)) for ch, pcm in enumerate(contents)]
    batch = [payloads[s % 4] for s in range(n_streams)]

    host_t0 = time.perf_counter()
    frames = parse_frames(cfg, batch)
    host_parse_s = time.perf_counter() - host_t0

    frames = jax.device_put(frames)
    state = decoder_init(cfg, n_streams)
    step = make_decode_step(cfg, nbytes * 8)

    # warmup / compile
    state, pcm = step(state, frames)
    pcm.block_until_ready()

    iters = 50
    t0 = time.perf_counter()
    for _ in range(iters):
        state, pcm = step(state, frames)
    pcm.block_until_ready()
    elapsed = time.perf_counter() - t0

    frames_per_sec = n_streams * iters / elapsed
    realtime_factor = frames_per_sec * frame_seconds
    baseline = 720.0  # reference: 720x realtime, 1 CPU core

    result = {
        "metric": "aggregate realtime decode factor per chip (48kHz/10ms mono, device DSP)",
        "value": round(realtime_factor, 1),
        "unit": "x_realtime",
        "vs_baseline": round(realtime_factor / baseline, 2),
        "detail": {
            "device": str(jax.devices()[0]),
            "n_streams": n_streams,
            "frames_per_sec": round(frames_per_sec, 0),
            "step_ms": round(elapsed / iters * 1e3, 3),
            "host_parse_ms_per_frame": round(host_parse_s / n_streams * 1e3, 4),
            "host_parse_realtime_factor": round(
                frame_seconds / (host_parse_s / n_streams), 1
            ),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Full-matrix throughput sweep (BASELINE.json config 5).

Runs the batched decode/encode DSP for every (sampling rate, duration) pair
and a bitrate ladder on the current device, writing a markdown table to
BENCH_SWEEP.md. The canonical single JSON line stays in bench.py.
"""

from __future__ import annotations

import time
from functools import partial

import numpy as np


def bench_config(cfg, nbytes, n_streams=1024, steps=6):
    import jax

    from lc3jax.coding import native
    from lc3jax.dsp.decoder import decode_step, decoder_init
    from lc3jax.dsp.encoder import encode_step, encoder_init
    from lc3jax.profiling import device_step_ms
    from lc3jax.ref.encoder import Lc3Encoder

    frame_seconds = cfg.nf / cfg.fs
    enc = Lc3Encoder(1, cfg.n_ms, cfg.fs)
    t = np.arange(cfg.nf) / cfg.fs
    pcm = (6000 * np.sin(2 * np.pi * 330 * t)).astype(np.int16)
    payload = bytes(enc.encode_frame(0, pcm, nbytes))
    arr = np.tile(np.frombuffer(payload, np.uint8), (n_streams, 1))

    frames = jax.device_put(native.parse_frames_native(cfg, arr))
    dstate = decoder_init(cfg, n_streams)
    dstep = jax.jit(partial(decode_step, cfg, nbytes * 8))
    dec_ms = device_step_ms(dstep, dstate, (frames,), steps=steps)
    dec_rtf = n_streams * frame_seconds / (dec_ms / 1e3)

    pcm_b = jax.device_put(np.tile(pcm, (n_streams, 1)))
    estate = encoder_init(cfg, n_streams)
    estep = jax.jit(partial(encode_step, cfg, nbytes))
    enc_ms = device_step_ms(estep, estate, (pcm_b,), steps=steps)
    enc_rtf = n_streams * frame_seconds / (enc_ms / 1e3)
    return dec_rtf, enc_rtf


def main() -> None:
    import jax

    from lc3jax.config import ALL_CONFIGS, FrameDuration

    lines = [
        "# Throughput sweep (device DSP, batched 1024 streams)",
        "",
        f"Device: {jax.devices()[0]}",
        "",
        "| fs | duration | bytes/frame | decode x realtime | encode x realtime |",
        "|---|---|---|---|---|",
    ]
    for cfg in ALL_CONFIGS:
        # bitrate ladder scaled to the frame duration: ~32 and ~96 kbps
        dur = 0.01 if cfg.n_ms == FrameDuration.MS10 else 0.0075
        for kbps in (32, 96):
            nbytes = max(20, int(kbps * 1000 * dur / 8))
            dec, enc = bench_config(cfg, nbytes)
            lines.append(
                f"| {cfg.fs} | {cfg.n_ms.value} | {nbytes} | {dec:,.0f} | {enc:,.0f} |"
            )
            print(lines[-1], flush=True)
    lines += [
        "",
        "## Stream-count scaling (48 kHz / 10 ms / 150 B, round 2)",
        "",
        "Round-2 fused paths measured separately (bench.py / device traces):",
        "fused bytes->PCM (Pallas range decoder + DSP) 1.92 ms = 10,676x at",
        "S=2048; fused PCM->bytes (DSP + Pallas range encoder) ~4.4 ms =",
        "~4,700x. S=2048 is the throughput-optimal batch: at S=8192 the LTPF",
        "scan path spills VMEM (decode DSP 5.13 ms = 15,969x; fused 9.60 ms",
        "= 8,529x) — run multiple S=2048 batches back to back instead. The",
        "opt-in Pallas LTPF kernel removes the spill but compiles slowly and",
        "breaks xprof, so the supported fast envelope is S <= 4096 on the",
        "default path.",
    ]
    with open("BENCH_SWEEP.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote BENCH_SWEEP.md")


if __name__ == "__main__":
    main()

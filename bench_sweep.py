#!/usr/bin/env python3
"""Full-matrix throughput sweep (BASELINE.json config 5).

Two independently regenerable sections, stitched into BENCH_SWEEP.md
between HTML-comment markers (so a fused-only rerun does not clobber the
DSP matrix and vice versa):

  python bench_sweep.py dsp     # 24-config decode/encode DSP matrix
  python bench_sweep.py fused   # fused bytes<->PCM kernel rows across the
                                # geometry/rate envelope (VERDICT r3 #7)
  python bench_sweep.py         # both

The canonical single JSON line stays in bench.py. All numbers are device
clock via lc3jax.profiling.device_step_ms (host wall-clock cannot time
device work on the axon tunnel, see CLAUDE.md).
"""

from __future__ import annotations

import re
import sys
from functools import partial

import numpy as np

DSP_BEGIN, DSP_END = "<!-- dsp-sweep -->", "<!-- /dsp-sweep -->"
FUSED_BEGIN, FUSED_END = "<!-- fused-sweep -->", "<!-- /fused-sweep -->"

# geometry/rate envelope for the fused kernels: both durations, the band
# extremes, and the 20 B / 400 B rate edges (the 400 B rows drive lsb_mode
# on every frame)
FUSED_CASES = [
    (8000, "MS7P5", 30),
    (8000, "MS10", 40),
    (16000, "MS10", 60),
    (48000, "MS7P5", 90),
    (48000, "MS10", 20),
    (48000, "MS10", 150),
    (48000, "MS10", 400),
]


def _content(cfg, nbytes, n_streams):
    from lc3jax.ref.encoder import Lc3Encoder

    enc = Lc3Encoder(1, cfg.n_ms, cfg.fs)
    t = np.arange(cfg.nf) / cfg.fs
    pcm = (6000 * np.sin(2 * np.pi * 330 * t)).astype(np.int16)
    payload = bytes(enc.encode_frame(0, pcm, nbytes))
    arr = np.tile(np.frombuffer(payload, np.uint8), (n_streams, 1))
    return pcm, arr


def bench_config(cfg, nbytes, n_streams=1024, steps=6):
    import jax

    from lc3jax.coding import native
    from lc3jax.dsp.decoder import decode_step, decoder_init
    from lc3jax.dsp.encoder import encode_step, encoder_init
    from lc3jax.profiling import device_step_ms

    frame_seconds = cfg.nf / cfg.fs
    pcm, arr = _content(cfg, nbytes, n_streams)

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


def bench_fused(cfg, nbytes, n_streams=2048, steps=4):
    """Fused bytes->PCM (Pallas range decoder + DSP) and PCM->bytes (DSP +
    Pallas range encoder) per-step device time for one geometry."""
    import jax

    from lc3jax.coding.device import decode_bytes_step
    from lc3jax.coding.pallas_pack import encode_bytes_step
    from lc3jax.dsp.decoder import decoder_init
    from lc3jax.dsp.encoder import encoder_init
    from lc3jax.profiling import device_step_ms

    frame_seconds = cfg.nf / cfg.fs
    pcm, arr = _content(cfg, nbytes, n_streams)

    state = decoder_init(cfg, n_streams)
    bytes_dev = jax.device_put(arr)
    fstep = jax.jit(partial(decode_bytes_step, cfg, nbytes))
    fd_ms = device_step_ms(fstep, state, (bytes_dev,), steps=steps)
    fd_rtf = n_streams * frame_seconds / (fd_ms / 1e3)

    pcm_b = jax.device_put(np.tile(pcm, (n_streams, 1)))
    estate = encoder_init(cfg, n_streams)
    estep = jax.jit(partial(encode_bytes_step, cfg, nbytes))
    fe_ms = device_step_ms(estep, estate, (pcm_b,), steps=steps)
    fe_rtf = n_streams * frame_seconds / (fe_ms / 1e3)
    return fd_ms, fd_rtf, fe_ms, fe_rtf


def _splice(text: str, begin: str, end: str, body: str) -> str:
    block = f"{begin}\n{body}\n{end}"
    if begin in text and end in text:
        return re.sub(
            re.escape(begin) + r".*?" + re.escape(end),
            lambda _m: block,
            text,
            flags=re.S,
        )
    return text.rstrip() + "\n\n" + block + "\n"


def run_dsp() -> str:
    import jax

    from lc3jax.config import ALL_CONFIGS, FrameDuration

    lines = [
        "## Device DSP matrix (batched 1024 streams)",
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
    return "\n".join(lines)


def run_fused() -> str:
    import jax

    from lc3jax.config import FrameDuration, Lc3Config

    lines = [
        "## Fused kernel matrix (bytes->PCM / PCM->bytes, 2048 streams)",
        "",
        f"Device: {jax.devices()[0]}. Fused decode = Pallas range decoder +",
        "DSP in one program; fused encode = analysis chain + Pallas range",
        "encoder. Per-step times are device clock.",
        "",
        "| fs | duration | bytes/frame | fused decode | decode x realtime "
        "| fused encode | encode x realtime |",
        "|---|---|---|---|---|---|---|",
    ]
    for fs, dur_name, nbytes in FUSED_CASES:
        cfg = Lc3Config.new(fs, getattr(FrameDuration, dur_name))
        fd_ms, fd, fe_ms, fe = bench_fused(cfg, nbytes)
        lines.append(
            f"| {fs} | {cfg.n_ms.value} | {nbytes} | {fd_ms:.3f} ms "
            f"| {fd:,.0f} | {fe_ms:.3f} ms | {fe:,.0f} |"
        )
        print(lines[-1], flush=True)
    return "\n".join(lines)


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    try:
        with open("BENCH_SWEEP.md") as f:
            text = f.read()
    except FileNotFoundError:
        text = "# Throughput sweep\n"
    if which in ("dsp", "both"):
        text = _splice(text, DSP_BEGIN, DSP_END, run_dsp())
    if which in ("fused", "both"):
        text = _splice(text, FUSED_BEGIN, FUSED_END, run_fused())
    with open("BENCH_SWEEP.md", "w") as f:
        f.write(text)
    print("wrote BENCH_SWEEP.md")


if __name__ == "__main__":
    main()

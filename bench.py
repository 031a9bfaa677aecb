#!/usr/bin/env python3
"""Throughput benchmark: batched LC3 on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Primary metric: aggregate realtime DECODE factor per chip at 48 kHz / 10 ms
mono for the end-to-end pipeline (native C++ bitstream parse on host + the
batched device DSP), bounded by whichever is slower. Baseline: the reference
implementation's published ~720x realtime on one Intel i7-6700K core
(reference README.md:124-125, BASELINE.md).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def _host_best_of(fn, iters: int) -> float:
    """Best-of-N wall time for a host-side stage: the minimum is the
    contention-robust estimator (any other process stealing the core only
    ever inflates a sample, never deflates it)."""
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    # defend the host-side numbers against a loaded machine (a stale test
    # process halved the round-3 committed host figures): if the 1-minute
    # load average says another process owns the core, wait once for it to
    # drain before measuring, and always record the load in the output
    load_at_start = os.getloadavg()
    waited_s = 0.0
    if load_at_start[0] > 0.75:
        time.sleep(45.0)
        waited_s = 45.0

    import jax

    from lc3jax.coding import native
    from lc3jax.coding.host import pack_frames, parse_frames
    from lc3jax.config import FrameDuration, Lc3Config
    from lc3jax.dsp.decoder import decoder_init, make_decode_step
    from lc3jax.dsp.encoder import encoder_init, make_encode_step
    from lc3jax.ref.encoder import Lc3Encoder

    cfg = Lc3Config.new(48000, FrameDuration.MS10)
    nbytes = 150
    n_streams = 2048
    frame_seconds = 0.01
    baseline = 720.0

    # realistic mixed-content frame batch
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
    batch_bytes = np.frombuffer(
        b"".join(payloads[s % 4] for s in range(n_streams)), np.uint8
    ).reshape(n_streams, nbytes)
    pcm_batch = np.stack([contents[s % 4] for s in range(n_streams)])

    # ---- host bitstream parse (native C++), best-of-N (contention-robust)
    use_native = native.available()
    if use_native:
        native.parse_frames_native(cfg, batch_bytes[:8])  # warm
        frames = native.parse_frames_native(cfg, batch_bytes,
                                            n_threads=os.cpu_count() or 1)
        host_parse_s = _host_best_of(
            lambda: native.parse_frames_native(
                cfg, batch_bytes, n_threads=os.cpu_count() or 1
            ),
            iters=12,
        )
    else:
        t0 = time.perf_counter()
        frames = parse_frames(cfg, [bytes(r) for r in batch_bytes])
        host_parse_s = time.perf_counter() - t0
    host_rtf = n_streams * frame_seconds / host_parse_s

    # ---- device decode DSP (trace-based: the device's own clock; host
    # wall-clock over the axon tunnel under-reports because dispatch is
    # asynchronous and block_until_ready does not fence)
    from functools import partial

    from lc3jax.dsp.decoder import decode_step
    from lc3jax.profiling import device_step_ms

    frames_dev = jax.device_put(frames)
    dstate = decoder_init(cfg, n_streams)
    dstep = jax.jit(partial(decode_step, cfg, nbytes * 8))  # no donation: timing
    dec_ms = device_step_ms(dstep, dstate, (frames_dev,), steps=10)
    dec_s = dec_ms / 1e3
    dec_rtf = n_streams * frame_seconds / dec_s

    # ---- device encode DSP
    from lc3jax.dsp.encoder import encode_step

    pcm_dev = jax.device_put(pcm_batch)
    estate = encoder_init(cfg, n_streams)
    estep = jax.jit(partial(encode_step, cfg, nbytes))
    enc_ms = device_step_ms(estep, estate, (pcm_dev,), steps=10)
    enc_s = enc_ms / 1e3
    enc_rtf = n_streams * frame_seconds / enc_s
    # host-pack fields come from the flattened-output jit (the [S, ne]
    # outputs' tiled device layout fetches as non-contiguous host views and
    # the packer's per-call ascontiguousarray copy cost ~35%; rank-1
    # outputs fetch dense — see serving.BatchEncoder._get_step)
    def estep_flat(state, pcm):
        st, f = encode_step(cfg, nbytes, state, pcm)
        return st, dict(f, x_q=f["x_q"].reshape(-1),
                        residual_bits=f["residual_bits"].reshape(-1))

    estate, fields = jax.jit(estep_flat)(estate, pcm_dev)
    jax.block_until_ready((estate, fields))

    # ---- host pack (encoder side)
    if use_native:
        fields_h = {k: np.asarray(v) for k, v in fields.items()}
        native.pack_frames_native(cfg, fields_h, nbytes)  # warm
        host_pack_s = _host_best_of(
            lambda: native.pack_frames_native(
                cfg, fields_h, nbytes, n_threads=os.cpu_count() or 1
            ),
            iters=8,
        )
        pack_rtf = n_streams * frame_seconds / host_pack_s
    else:
        pack_rtf = 0.0

    # ---- fully fused on-device decode: raw frame bytes -> PCM in one XLA
    # program (Pallas range decoder + batched DSP), no host in the loop
    from lc3jax.coding.device import decode_bytes_step

    bytes_dev = jax.device_put(batch_bytes)
    fstate = decoder_init(cfg, n_streams)
    fstep = jax.jit(partial(decode_bytes_step, cfg, nbytes))
    fused_ms = device_step_ms(fstep, fstate, (bytes_dev,), steps=10)
    fused_rtf = n_streams * frame_seconds / (fused_ms / 1e3)

    # fully fused on-device encode: PCM -> frame bytes (analysis DSP +
    # Pallas range encoder)
    from lc3jax.coding.pallas_pack import encode_bytes_step

    e2state = encoder_init(cfg, n_streams)
    e2step = jax.jit(partial(encode_bytes_step, cfg, nbytes))
    fenc_ms = device_step_ms(e2step, e2state, (pcm_dev,), steps=8)
    fenc_rtf = n_streams * frame_seconds / (fenc_ms / 1e3)

    # host-pipelined alternative (parse on host cores, DSP on device,
    # overlapped): bounded by the slower side
    pipelined_rtf = min(host_rtf, dec_rtf)

    # ... and MEASURED: run the real serving loop
    # (BatchDecoder.decode_stream(pipeline=True): prefetch thread parsing
    # batch k+1 while the device runs batch k) over M batches and take the
    # device-clock span of the whole window (first event start to last
    # event end, idle gaps included — the honest pipelined number; host
    # wall-clock is untrustworthy over the axon tunnel, CLAUDE.md).
    from lc3jax.profiling import device_loop_span_ms
    from lc3jax.serving import BatchDecoder

    bd = BatchDecoder(cfg, n_streams, nbytes)
    bd.decode_stream([batch_bytes], fetch=False)  # warm compile + caches
    M = 24
    span_ms = device_loop_span_ms(
        lambda: bd.decode_stream([batch_bytes] * M, fetch=False,
                                 pipeline=True)[-1]
    )
    pipelined_meas_rtf = (
        M * n_streams * frame_seconds / (span_ms / 1e3) if span_ms else 0.0
    )
    e2e_rtf = max(fused_rtf, pipelined_rtf)

    result = {
        "metric": "aggregate realtime decode factor per chip (48kHz/10ms mono, e2e bytes->PCM on device)",
        "value": round(e2e_rtf, 1),
        "unit": "x_realtime",
        "vs_baseline": round(e2e_rtf / baseline, 2),
        "detail": {
            "device": str(jax.devices()[0]),
            "n_streams": n_streams,
            "fused_bytes_to_pcm_x_realtime": round(fused_rtf, 0),
            "fused_step_ms": round(fused_ms, 3),
            "fused_pcm_to_bytes_x_realtime": round(fenc_rtf, 0),
            "fused_encode_step_ms": round(fenc_ms, 3),
            "decode_dsp_x_realtime": round(dec_rtf, 0),
            "encode_dsp_x_realtime": round(enc_rtf, 0),
            "host_parse_x_realtime": round(host_rtf, 0),
            "host_pack_x_realtime": round(pack_rtf, 0),
            "host_pipelined_x_realtime": round(pipelined_rtf, 0),
            "host_pipelined_measured_x_realtime": round(pipelined_meas_rtf, 0),
            "host_pipelined_measured_span_ms": round(span_ms, 1),
            "host_pipelined_measured_batches": M,
            "host_parse_native": use_native,
            "host_cores": os.cpu_count(),
            "loadavg_at_start": [round(x, 2) for x in load_at_start],
            "loadavg_at_end": [round(x, 2) for x in os.getloadavg()],
            "waited_for_idle_s": waited_s,
            "decode_step_ms": round(dec_s * 1e3, 3),
            "encode_step_ms": round(enc_s * 1e3, 3),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()

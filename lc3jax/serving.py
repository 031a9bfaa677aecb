"""Serving runtime: pipelined batch codec objects.

The production loop overlaps the host bitstream work (C++ parse/pack) for
batch k+1 with the device DSP for batch k — the two halves of the e2e
pipeline measured separately in bench.py. `BatchDecoder.decode_stream`
drives that overlap with a single prefetch thread; steady-state throughput
is min(host, device) rather than their sum of latencies.
"""

from __future__ import annotations

import queue
import threading
from functools import partial

import jax
import numpy as np

from .coding import native
from .coding.host import pack_frames, parse_frames
from .config import Lc3Config
from .dsp.decoder import DecoderState, decode_step, decoder_init
from .dsp.encoder import encode_step, encoder_init
from .metrics import CodecMetrics


class BatchDecoder:
    """Decodes batches of [n_streams] frames per call.

    payloads: uint8 [S, nbytes] (one frame per stream). Returns int16
    PCM [S, nf]. Corrupt frames are concealed (PLC) per stream.
    """

    def __init__(self, cfg: Lc3Config, n_streams: int, nbytes: int,
                 device_parse: bool = False):
        """device_parse=True runs the whole bytes->PCM pipeline on device
        (Pallas range decoder fused with the DSP) — no host work per batch.
        Measured on v5e at S=2048/48k/150B: 10,676x realtime vs ~2,500x for
        the host-parse pipeline on a 1-core host."""
        self.cfg = cfg
        self.n_streams = n_streams
        self.nbytes = nbytes
        self.device_parse = device_parse
        self.state: DecoderState = decoder_init(cfg, n_streams)
        self._steps: dict = {}
        self._step = self._get_step(nbytes)
        self.metrics = CodecMetrics()
        self._frame_seconds = cfg.nf / cfg.fs

    def _get_step(self, nbytes: int, stats: bool = False):
        # the decoder state depends only on (cfg, n_streams), so a stream may
        # change its frame size at any frame boundary (the reference derives
        # nbits from the buffer length per call, lc3_encoder.rs:65): one
        # jitted program per nbytes, state carried across program switches
        key = (nbytes, stats)
        if key not in self._steps:
            if self.device_parse:
                from .coding.device import (decode_bytes_step,
                                            decode_bytes_step_stats)

                fn = decode_bytes_step_stats if stats else decode_bytes_step
                self._steps[key] = jax.jit(partial(fn, self.cfg, nbytes))
            else:
                self._steps[key] = jax.jit(
                    partial(decode_step, self.cfg, nbytes * 8)
                )
        return self._steps[key]

    def _parse(self, payloads: np.ndarray):
        if native.available():
            return native.parse_frames_native(self.cfg, payloads)
        return parse_frames(self.cfg, [bytes(r) for r in payloads])

    def decode(self, payloads: np.ndarray) -> np.ndarray:
        """payloads uint8 [S, nbytes]; nbytes may differ per call (variable
        bitrate mid-stream, state preserved)."""
        if self.device_parse:
            # the stats variant also returns the concealed-frame count (a
            # device scalar, fetched alongside the PCM) so plc_rate stays
            # observable on the fused path
            step = self._get_step(payloads.shape[1], stats=True)
            self.state, pcm, n_bad = step(self.state, jax.device_put(payloads))
            self.metrics.record_decode(
                self.n_streams, self._frame_seconds, n_bad=int(n_bad)
            )
            return np.asarray(pcm)
        step = self._get_step(payloads.shape[1])
        host_frames = self._parse(payloads)
        n_bad = int(np.asarray(host_frames.bad_frame).sum())  # host-side count
        frames = jax.device_put(host_frames)
        self.state, pcm = step(self.state, frames)
        self.metrics.record_decode(self.n_streams, self._frame_seconds, n_bad=n_bad)
        return np.asarray(pcm)

    def decode_stream(self, payload_batches, fetch: bool = True,
                      pipeline: bool = False, chunk_frames: int = 0) -> list:
        """Decode an iterable of [S, nbytes] batches.

        pipeline=True overlaps host parsing of batch k+1 with the device DSP
        of batch k via a prefetch thread.

        chunk_frames=T (device_parse mode only) groups T consecutive batches
        into one [T, S, nbytes] dispatch through the fused frame-scan
        (dsp.streaming.decode_bytes_frames): one dispatch + one PCM fetch
        per chunk instead of per frame, amortising the container's expensive
        D2H path (~180 ms/fetch over the axon tunnel caps per-frame
        fetch=True loops at ~120x realtime; chunking recovers T x that).
        Frame sizes must be constant within a stream when chunking. A
        trailing partial chunk falls back to per-batch dispatch.

        Measured on this container (axon tunnel, S=2048/48k/150B): parse
        ~8 ms, decode DSP 0.8 ms, but the per-batch PCM fetch costs
        ~180 ms because the tunnel's device->host path moves ~10 MB/s —
        the loop is fetch-bound at ~120x realtime here. On a real TPU host
        D2H runs at PCIe rates (the same fetch is ~1 ms) and throughput is
        parse-bound per core. fetch=False keeps PCM on device for
        on-device consumers (the TPU-side production shape).

        With device_parse=True there is no host stage to overlap: batches
        feed the fused bytes->PCM program directly (pipeline is ignored)."""
        if self.device_parse and chunk_frames > 1:
            return self._decode_stream_chunked(payload_batches, fetch,
                                               chunk_frames)
        if self.device_parse:
            outs = []
            for batch in payload_batches:
                if fetch:
                    # count concealed frames on device; the int() fetch rides
                    # the same sync as the PCM fetch
                    step = self._get_step(batch.shape[1], stats=True)
                    self.state, pcm, n_bad = step(
                        self.state, jax.device_put(batch)
                    )
                    self.metrics.record_decode(
                        self.n_streams, self._frame_seconds, n_bad=int(n_bad)
                    )
                    outs.append(np.asarray(pcm))
                else:
                    # fetch=False keeps dispatch fully asynchronous: fetching
                    # a per-batch scalar would serialize the loop, so
                    # plc_frames/plc_rate are not tracked in this mode
                    step = self._get_step(batch.shape[1])
                    self.state, pcm = step(self.state, jax.device_put(batch))
                    self.metrics.record_decode(
                        self.n_streams, self._frame_seconds
                    )
                    outs.append(pcm)
            if not fetch and outs:
                jax.block_until_ready(outs[-1])
            return outs
        if not pipeline:
            outs = []
            for batch in payload_batches:
                host_frames = self._parse(batch)
                n_bad = int(np.asarray(host_frames.bad_frame).sum())
                frames = jax.device_put(host_frames)
                jax.block_until_ready(frames)
                self.state, pcm = self._step(self.state, frames)
                self.metrics.record_decode(
                    self.n_streams, self._frame_seconds, n_bad=n_bad
                )
                outs.append(np.asarray(pcm) if fetch else pcm)
            if not fetch and outs:
                jax.block_until_ready(outs[-1])
            return outs
        q: queue.Queue = queue.Queue(maxsize=2)

        def producer():
            # Any producer failure (bad shape/dtype, native parser assert,
            # transfer error) is forwarded to the consumer; the sentinel is
            # enqueued unconditionally so the consumer can never block
            # forever on q.get().
            try:
                for batch in payload_batches:
                    host_frames = self._parse(batch)
                    n_bad = int(np.asarray(host_frames.bad_frame).sum())
                    frames = jax.device_put(host_frames)
                    # ensure the host->device copy completes before the parse
                    # buffers get recycled
                    jax.block_until_ready(frames)
                    q.put((frames, n_bad))
            except BaseException as e:  # noqa: BLE001 - re-raised in consumer
                q.put(e)
            finally:
                q.put(None)

        th = threading.Thread(target=producer, daemon=True)
        th.start()
        outs = []
        err = None
        while True:
            item = q.get()
            if item is None:
                break
            if isinstance(item, BaseException):
                err = item
                continue  # drain until the sentinel, then join + raise
            frames, n_bad = item
            self.state, pcm = self._step(self.state, frames)
            self.metrics.record_decode(
                self.n_streams, self._frame_seconds, n_bad=n_bad
            )
            outs.append(np.asarray(pcm) if fetch else pcm)
        th.join()
        if err is not None:
            raise err
        if not fetch and outs:
            jax.block_until_ready(outs[-1])
        return outs


    def _get_chunk_step(self, nbytes: int, T: int):
        key = ("chunk", nbytes, T)
        if key not in self._steps:
            from .dsp.streaming import decode_bytes_frames

            self._steps[key] = jax.jit(
                partial(decode_bytes_frames, self.cfg, nbytes)
            )
        return self._steps[key]

    def _decode_stream_chunked(self, payload_batches, fetch: bool, T: int):
        import numpy as _np

        outs = []
        buf: list = []

        def flush(chunk):
            if len(chunk) == T:
                step = self._get_chunk_step(chunk[0].shape[1], T)
                stacked = jax.device_put(_np.stack(chunk))
                self.state, pcm = step(self.state, stacked)
                self.metrics.record_decode(
                    self.n_streams * T, self._frame_seconds
                )
                if fetch:
                    outs.extend(_np.asarray(pcm))  # [T, S, nf] -> T arrays
                else:
                    outs.extend(pcm[t] for t in range(T))
            else:  # trailing partial chunk: per-batch dispatch
                for b in chunk:
                    step = self._get_step(b.shape[1])
                    self.state, pcm = step(self.state, jax.device_put(b))
                    self.metrics.record_decode(
                        self.n_streams, self._frame_seconds
                    )
                    outs.append(_np.asarray(pcm) if fetch else pcm)

        for batch in payload_batches:
            if buf and batch.shape[1] != buf[0].shape[1]:
                flush(buf)  # nbytes changed mid-stream: close the chunk
                buf = []
            buf.append(batch)
            if len(buf) == T:
                flush(buf)
                buf = []
        if buf:
            flush(buf)
        if not fetch and outs:
            jax.block_until_ready(outs[-1])
        return outs


class BatchEncoder:
    """Encodes batches of [n_streams, nf] int16 PCM into frames."""

    def __init__(self, cfg: Lc3Config, n_streams: int, nbytes: int,
                 device_pack: bool = False):
        """device_pack=True runs the whole PCM->bytes pipeline on device
        (analysis DSP fused with the Pallas range encoder) — no host work
        per batch. Measured on v5e at S=2048/48k/150B: 4,578x realtime vs
        ~2,700x for the host-pack pipeline on a 1-core host."""
        self.cfg = cfg
        self.n_streams = n_streams
        self.nbytes = nbytes
        self.device_pack = device_pack
        self.state = encoder_init(cfg, n_streams)
        self._steps: dict = {}
        self._step = self._get_step(nbytes)
        self.metrics = CodecMetrics()
        self._frame_seconds = cfg.nf / cfg.fs

    def _get_step(self, nbytes: int):
        # encoder state is nbytes-independent (the bit-budget adaptation
        # scalars carry across rate switches exactly as the reference's
        # per-frame `nbits = buf_out.len()*8`, lc3_encoder.rs:65)
        if nbytes not in self._steps:
            if self.device_pack:
                from .coding.pallas_pack import encode_bytes_step

                self._steps[nbytes] = jax.jit(
                    partial(encode_bytes_step, self.cfg, nbytes)
                )
            else:
                def step(state, pcm, _nb=nbytes):
                    st, f = encode_step(self.cfg, _nb, state, pcm)
                    # flatten the two big arrays so they leave the program
                    # in a dense rank-1 layout: the [S, ne] outputs' tiled
                    # device layout fetches as non-contiguous host views,
                    # and the packers' per-call ascontiguousarray copy was
                    # ~35% of the host pack step (round 5). The on-device
                    # relayout is ~us at HBM bandwidth; the packers accept
                    # rank-1 and reshape for free.
                    f = dict(f, x_q=f["x_q"].reshape(-1),
                             residual_bits=f["residual_bits"].reshape(-1))
                    return st, f

                self._steps[nbytes] = jax.jit(step)
        return self._steps[nbytes]

    def encode(self, pcm: np.ndarray, nbytes: int | None = None) -> np.ndarray:
        """pcm int16 [S, nf] -> uint8 [S, nbytes]; nbytes may vary per call
        (variable bitrate mid-stream, state preserved)."""
        nbytes = self.nbytes if nbytes is None else nbytes
        step = self._get_step(nbytes)
        if self.device_pack:
            self.state, payloads = step(self.state, jax.device_put(pcm))
            self.metrics.record_encode(self.n_streams, self._frame_seconds)
            return np.asarray(payloads)
        self.state, fields = step(self.state, pcm)
        fields = {k: np.asarray(v) for k, v in fields.items()}
        self.metrics.record_encode(self.n_streams, self._frame_seconds)
        if native.available():
            return native.pack_frames_native(self.cfg, fields, nbytes)
        rows = pack_frames(self.cfg, fields, nbytes)
        return np.frombuffer(b"".join(rows), np.uint8).reshape(
            self.n_streams, nbytes
        )

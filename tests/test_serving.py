"""Serving runtime: batch codec objects + pipelined decode loop."""

import numpy as np

from lc3jax.config import FrameDuration, Lc3Config
from lc3jax.ref.decoder import Lc3Decoder
from lc3jax.ref.encoder import Lc3Encoder
from lc3jax.serving import BatchDecoder, BatchEncoder

CFG48 = Lc3Config.new(48000, FrameDuration.MS10)


def _signal(nframes, freq, amp=7000):
    t = np.arange(nframes * 480) / 48000
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.int16)


def test_roundtrip_through_serving_objects():
    S, nbytes, nframes = 3, 80, 6
    sigs = [_signal(nframes, f) for f in (220, 440, 997)]
    enc = BatchEncoder(CFG48, S, nbytes)
    dec = BatchDecoder(CFG48, S, nbytes)
    refs = [Lc3Decoder(1, FrameDuration.MS10, 48000) for _ in range(S)]

    for f in range(nframes):
        pcm_in = np.stack([s[f * 480 : (f + 1) * 480] for s in sigs])
        payloads = enc.encode(pcm_in)
        assert payloads.shape == (S, nbytes)
        pcm_out = dec.decode(payloads)
        for s in range(S):
            ref = refs[s].decode_frame(16, 0, bytes(payloads[s]))
            assert np.abs(pcm_out[s].astype(int) - ref.astype(int)).max() <= 1

    assert dec.metrics.frames_decoded == S * nframes
    assert enc.metrics.frames_encoded == S * nframes
    assert dec.metrics.plc_rate == 0.0


def test_pipelined_decode_stream_matches_sequential():
    S, nbytes, nframes = 2, 80, 8
    sig = _signal(nframes, 330)
    oracle_enc = Lc3Encoder(1, FrameDuration.MS10, 48000)
    batches = []
    for f in range(nframes):
        p = bytes(oracle_enc.encode_frame(0, sig[f * 480 : (f + 1) * 480], nbytes))
        batches.append(np.frombuffer(p * S, np.uint8).reshape(S, nbytes).copy())
    batches[4][1] = 255  # corrupt one stream's frame mid-run

    dec_seq = BatchDecoder(CFG48, S, nbytes)
    seq = [dec_seq.decode(b) for b in batches]
    dec_pipe = BatchDecoder(CFG48, S, nbytes)
    piped = dec_pipe.decode_stream(iter(batches), pipeline=True)
    assert len(piped) == nframes
    for a, b in zip(seq, piped):
        assert np.array_equal(a, b)
    assert dec_pipe.metrics.plc_frames == 1


def test_pipelined_decode_stream_propagates_producer_error():
    """A producer-thread failure must raise in the caller, not hang."""
    S, nbytes = 2, 80
    oracle_enc = Lc3Encoder(1, FrameDuration.MS10, 48000)
    sig = _signal(1, 330)
    p = bytes(oracle_enc.encode_frame(0, sig, nbytes))
    good = np.frombuffer(p * S, np.uint8).reshape(S, nbytes).copy()

    def batches():
        yield good
        raise RuntimeError("upstream source failed")

    dec = BatchDecoder(CFG48, S, nbytes)
    import pytest

    with pytest.raises(RuntimeError, match="upstream source failed"):
        dec.decode_stream(batches(), pipeline=True)


def test_device_parse_mode_matches_host_parse_mode():
    """BatchDecoder(device_parse=True) = fused bytes->PCM (the XLA parser
    formulation on CPU; the Pallas kernel on TPU): same PCM as the
    host-parse mode within the usual rounding envelope."""
    S, nbytes, nframes = 128, 80, 3
    sig = _signal(nframes, 330)
    enc = BatchEncoder(CFG48, S, nbytes)
    a = BatchDecoder(CFG48, S, nbytes)
    b = BatchDecoder(CFG48, S, nbytes, device_parse=True)
    for f in range(nframes):
        pcm_in = np.tile(sig[f * 480 : (f + 1) * 480], (S, 1))
        payloads = enc.encode(pcm_in)
        pa = a.decode(payloads)
        pb = b.decode(payloads)
        assert np.abs(pa.astype(int) - pb.astype(int)).max() <= 1


def test_device_parse_decode_stream():
    S, nbytes, nframes = 128, 80, 4
    sig = _signal(nframes, 550)
    enc = BatchEncoder(CFG48, S, nbytes)
    batches = []
    for f in range(nframes):
        batches.append(enc.encode(np.tile(sig[f * 480 : (f + 1) * 480], (S, 1))))
    a = BatchDecoder(CFG48, S, nbytes)
    b = BatchDecoder(CFG48, S, nbytes, device_parse=True)
    outs_a = a.decode_stream(iter(batches))
    outs_b = b.decode_stream(iter(batches), pipeline=True)  # ignored flag
    for f in range(nframes):
        assert np.abs(outs_a[f].astype(int) - outs_b[f].astype(int)).max() <= 1
    assert b.metrics.frames_decoded == S * nframes


def test_device_parse_decode_stream_chunked():
    """chunk_frames=T must match the per-batch fused loop exactly (same
    decode_bytes_step scanned over the frame axis), including a trailing
    partial chunk."""
    S, nbytes, nframes = 128, 80, 5
    sig = _signal(nframes, 660)
    enc = BatchEncoder(CFG48, S, nbytes)
    batches = []
    for f in range(nframes):
        batches.append(enc.encode(np.tile(sig[f * 480 : (f + 1) * 480], (S, 1))))
    a = BatchDecoder(CFG48, S, nbytes, device_parse=True)
    b = BatchDecoder(CFG48, S, nbytes, device_parse=True)
    outs_a = a.decode_stream(iter(batches), fetch=False)
    outs_b = b.decode_stream(iter(batches), chunk_frames=2)  # 2+2+1 partial
    assert len(outs_b) == nframes
    for f in range(nframes):
        assert np.array_equal(np.asarray(outs_a[f]), outs_b[f])
    assert b.metrics.frames_decoded == S * nframes

"""Differential fuzzing of the three bitstream parser implementations.

Random byte frames must produce identical outputs (or identical PLC flags)
across the Python reference parser, the C++ native parser and the on-device
XLA parser — and must never crash any of them.
"""

import dataclasses

import numpy as np
import pytest

from lc3jax.coding import native
from lc3jax.coding.host import parse_frames
from lc3jax.config import FrameDuration, Lc3Config

CFG48 = Lc3Config.new(48000, FrameDuration.MS10)


def _random_frames(n, nbytes, seed):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (n, nbytes), dtype=np.uint8)


@pytest.mark.skipif(not native.available(), reason="native library not built")
def test_native_matches_python_on_random_bytes():
    arr = _random_frames(256, 80, 7)
    pf_n = native.parse_frames_native(CFG48, arr)
    pf_p = parse_frames(CFG48, [bytes(r) for r in arr])
    badm = np.asarray(pf_p.bad_frame)
    for field in dataclasses.fields(pf_n):
        a = np.asarray(getattr(pf_n, field.name))
        b = np.asarray(getattr(pf_p, field.name))
        if field.name == "bad_frame":
            assert np.array_equal(a, b)
        else:
            assert np.array_equal(a[~badm], b[~badm]), field.name
    # random bytes should overwhelmingly be rejected, but some decode fine
    assert badm.mean() > 0.2


def test_device_parser_matches_python_on_random_bytes():
    """The on-device XLA parser joins the differential fuzz: identical
    outputs on clean frames and identical bad_frame flags on garbage."""
    import jax

    from lc3jax.coding.device import device_parse
    from lc3jax.ref.encoder import Lc3Encoder

    nbytes = 80
    # mix garbage with some valid frames so both branches are exercised
    arr = _random_frames(24, nbytes, 11)
    t = np.arange(2 * 480) / 48000
    sig = (7000 * np.sin(2 * np.pi * 440 * t)).astype(np.int16)
    enc = Lc3Encoder(1, FrameDuration.MS10, 48000)
    for f in range(2):
        p = bytes(enc.encode_frame(0, sig[f * 480 : (f + 1) * 480], nbytes))
        arr[f] = np.frombuffer(p, np.uint8)

    pf_d = jax.jit(lambda a: device_parse(CFG48, nbytes, a))(arr)
    pf_p = parse_frames(CFG48, [bytes(r) for r in arr])
    badm = np.asarray(pf_p.bad_frame)
    assert not badm[:2].any()
    for field in dataclasses.fields(pf_d):
        a = np.asarray(getattr(pf_d, field.name))
        b = np.asarray(getattr(pf_p, field.name))
        if field.name == "bad_frame":
            assert np.array_equal(a, b), (
                f"bad_frame mismatch: device {a.astype(int)} vs host {b.astype(int)}"
            )
        else:
            assert np.array_equal(a[~badm], b[~badm]), field.name


def test_python_parser_never_crashes_on_garbage():
    for seed in range(3):
        arr = _random_frames(64, 40, seed)
        pf = parse_frames(CFG48, [bytes(r) for r in arr])
        assert np.asarray(pf.bad_frame).shape == (64,)


def test_oracle_decoder_survives_garbage_stream():
    from lc3jax.ref.decoder import Lc3Decoder

    dec = Lc3Decoder(1, FrameDuration.MS10, 48000)
    rng = np.random.default_rng(3)
    for _ in range(20):
        frame = bytes(rng.integers(0, 256, 100, dtype=np.uint8))
        pcm = dec.decode_frame(16, 0, frame)
        assert pcm.shape == (480,)
        assert np.abs(pcm.astype(np.int64)).max() <= 32768

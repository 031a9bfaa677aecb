"""On-device range decoder vs the host parser: bit-exact.

The first run compiles for minutes on CPU (persistent cache set in
conftest.py makes reruns cheap)."""

import dataclasses
from functools import partial

import jax
import numpy as np

from lc3jax.coding.device import device_parse
from lc3jax.coding.host import parse_frames
from lc3jax.config import FrameDuration, Lc3Config
from lc3jax.ref.encoder import Lc3Encoder

CFG48 = Lc3Config.new(48000, FrameDuration.MS10)


def test_device_parse_matches_host():
    nbytes = 150
    rng = np.random.default_rng(11)
    t = np.arange(2 * 480) / 48000
    streams = [
        (8000 * np.sin(2 * np.pi * 220 * t)).astype(np.int16),
        (28000 * rng.standard_normal(len(t))).astype(np.int16),  # triggers lsb_mode
        np.zeros(len(t), np.int16),
        (1200 * rng.standard_normal(len(t))).astype(np.int16),
    ]
    encs = [Lc3Encoder(1, FrameDuration.MS10, 48000) for _ in streams]
    payloads = []
    for f in range(2):
        for s, sig in enumerate(streams):
            payloads.append(bytes(encs[s].encode_frame(0, sig[f * 480 : (f + 1) * 480], nbytes)))
    arr = np.frombuffer(b"".join(payloads), np.uint8).reshape(len(payloads), nbytes).copy()
    arr[2] = 255  # corrupt -> PLC flag
    payloads = [bytes(r) for r in arr]

    pf_p = parse_frames(CFG48, payloads)
    assert np.asarray(pf_p.lsb_mode).sum() >= 1  # lsb path exercised
    pf_d = jax.jit(partial(device_parse, CFG48, nbytes))(arr)

    badm = np.asarray(pf_p.bad_frame)
    for field in dataclasses.fields(pf_d):
        a = np.asarray(getattr(pf_d, field.name))
        b = np.asarray(getattr(pf_p, field.name))
        if field.name == "bad_frame":
            assert np.array_equal(a, b)
        else:
            assert np.array_equal(a[~badm], b[~badm]), field.name

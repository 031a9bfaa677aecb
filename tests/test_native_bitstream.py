"""Native (C++) bitstream codec vs the Python reference path: bit-exact."""

import dataclasses
from functools import partial

import jax
import numpy as np
import pytest

from lc3jax.config import FrameDuration, Lc3Config
from lc3jax.coding import native
from lc3jax.coding.host import pack_frames, parse_frames
from lc3jax.ref.encoder import Lc3Encoder

CFG48 = Lc3Config.new(48000, FrameDuration.MS10)

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built (run native/build.sh)"
)


def _mixed_payloads(nbytes, nframes=6):
    rng = np.random.default_rng(9)
    t = np.arange(nframes * 480) / 48000
    streams = [
        (8000 * np.sin(2 * np.pi * 220 * t)).astype(np.int16),
        (1000 * rng.standard_normal(len(t))).astype(np.int16),
        np.zeros(len(t), np.int16),
    ]
    encs = [Lc3Encoder(1, FrameDuration.MS10, 48000) for _ in streams]
    out = []
    for f in range(nframes):
        for s, sig in enumerate(streams):
            out.append(bytes(encs[s].encode_frame(0, sig[f * 480 : (f + 1) * 480], nbytes)))
    return out


@pytest.mark.parametrize("nbytes", [40, 80, 150])
def test_parse_matches_python(nbytes):
    payloads = _mixed_payloads(nbytes)
    arr = np.frombuffer(b"".join(payloads), np.uint8).reshape(len(payloads), nbytes)
    pf_n = native.parse_frames_native(CFG48, arr)
    pf_p = parse_frames(CFG48, payloads)
    for field in dataclasses.fields(pf_n):
        a = np.asarray(getattr(pf_n, field.name))
        b = np.asarray(getattr(pf_p, field.name))
        assert np.array_equal(a, b), field.name


def test_parse_flags_corrupt_frames():
    payloads = _mixed_payloads(80, nframes=2)
    arr = np.frombuffer(b"".join(payloads), np.uint8).reshape(len(payloads), 80).copy()
    arr[1] = 255
    arr[4, :10] = 0
    pf = native.parse_frames_native(CFG48, arr)
    pf_p = parse_frames(CFG48, [bytes(r) for r in arr])
    assert np.array_equal(pf.bad_frame, np.asarray(pf_p.bad_frame))


@pytest.mark.parametrize("S", [1, 3, 5])
def test_parse_pair_loop_drain_paths(S):
    """The interleaved pair loop's edge paths stay bit-exact.

    The native parser drives two frames at a time through the spectral
    range decoder (native/lc3_bitstream.cc spec_loop2): odd batch sizes
    exercise the single-frame tail, a corrupt partner exercises the
    early-exit drain, and content with very different lastnz exercises
    the unequal-length drain.
    """
    nbytes = 80
    payloads = _mixed_payloads(nbytes, nframes=2)  # mixed lastnz lengths
    rows = [bytearray(payloads[i % len(payloads)]) for i in range(S)]
    if S >= 3:
        rows[1][:] = b"\xff" * nbytes  # corrupt partner of frame 0
    arr = np.frombuffer(b"".join(bytes(r) for r in rows), np.uint8).reshape(S, nbytes)
    pf_n = native.parse_frames_native(CFG48, arr)
    pf_p = parse_frames(CFG48, [bytes(r) for r in rows])
    for field in dataclasses.fields(pf_n):
        a = np.asarray(getattr(pf_n, field.name))
        b = np.asarray(getattr(pf_p, field.name))
        assert np.array_equal(a, b), field.name


def test_pack_matches_python():
    from lc3jax.dsp.encoder import encode_step, encoder_init

    nbytes = 80
    rng = np.random.default_rng(5)
    t = np.arange(480) / 48000
    batch = np.stack(
        [
            (8000 * np.sin(2 * np.pi * 220 * t)).astype(np.int16),
            (1500 * rng.standard_normal(480)).astype(np.int16),
            np.zeros(480, np.int16),
        ]
    )
    state = encoder_init(CFG48, 3)
    step = jax.jit(partial(encode_step, CFG48, nbytes))
    _, fields = step(state, batch)
    fields = {k: np.asarray(v) for k, v in fields.items()}
    py = pack_frames(CFG48, fields, nbytes)
    nat = native.pack_frames_native(CFG48, fields, nbytes)
    for s in range(3):
        assert bytes(nat[s]) == py[s], f"stream {s}"


def test_pack_rejects_inconsistent_fields():
    """Out-of-range fields must raise (rows zeroed), never corrupt memory."""
    from functools import partial as _p

    from lc3jax.dsp.encoder import encode_step, encoder_init

    nbytes = 80
    t = np.arange(480) / 48000
    batch = np.stack([(8000 * np.sin(2 * np.pi * 220 * t)).astype(np.int16)] * 2)
    state = encoder_init(CFG48, 2)
    _, fields = jax.jit(_p(encode_step, CFG48, nbytes))(state, batch)
    fields = {k: np.asarray(v).copy() for k, v in fields.items()}

    for key, bad_value in [
        ("quant_lastnz_trunc", 999),   # > ne
        ("quant_lastnz_trunc", 3),     # odd
        ("tns_rc_order", 9),           # > 8, indexes past the order tables
        ("tns_rc_i", -1),              # negative coef index
        ("tns_num_tns_filters", 7),    # > 2
    ]:
        bad = {k: v.copy() for k, v in fields.items()}
        flat = bad[key].reshape(-1)
        flat[0] = bad_value
        if key == "tns_rc_i":  # coef indices only read when a filter is on
            bad["tns_num_tns_filters"].reshape(-1)[0] = 1
            bad["tns_rc_order"].reshape(-1)[0] = 1
        with pytest.raises(ValueError, match="rejected"):
            native.pack_frames_native(CFG48, bad, nbytes)

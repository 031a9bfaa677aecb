"""Batched TPU decoder vs the bit-exact oracle.

The JAX path trades the reference's exact f32 op ordering for MXU matmuls
and fused vector ops; parity criterion is int16 PCM within +-1 LSB (float
rounding at the int boundary), with the golden frame decoding bit-exactly.
"""

import jax
import numpy as np
import pytest

from lc3jax.config import FrameDuration, Lc3Config
from lc3jax.coding.host import parse_frames
from lc3jax.dsp.decoder import decode_step, decoder_init, exp2_fast
from lc3jax.dsp.ltpf import ltpf_init, ltpf_run
from lc3jax.dsp.params import decoder_params
from lc3jax.ref.decoder import Lc3Decoder
from lc3jax.ref.encoder import Lc3Encoder
from lc3jax.ref.ltpf import LongTermPostFilter
from lc3jax.ref.side_info import LtpfInfo

CFG48 = Lc3Config.new(48000, FrameDuration.MS10)


def test_golden_frame_bit_exact(goldens):
    g = goldens("decode_frame")
    frame = bytes(int(b) for b in g["buf_in"])
    state = decoder_init(CFG48, 2)
    step = jax.jit(lambda s, f: decode_step(CFG48, 1200, s, f))
    _, pcm = step(state, parse_frames(CFG48, [frame, frame]))
    assert np.array_equal(np.asarray(pcm)[0], g["pcm_expected"].astype(np.int16))
    assert np.array_equal(np.asarray(pcm)[1], g["pcm_expected"].astype(np.int16))


def test_exp2_fast_matches_reference_approximation():
    from lc3jax.ref import fp

    xs = np.linspace(-10, 10, 4001).astype(np.float32)
    j = np.asarray(jax.jit(exp2_fast)(xs))
    o = np.array([fp.exp2_raw(v) for v in xs], dtype=np.float32)
    ulp = np.abs(j.view(np.int32) - o.view(np.int32))
    assert ulp.max() <= 1  # XLA may fuse the polynomial with fma


def test_ltpf_all_transitions_vs_oracle():
    p = decoder_params(CFG48)
    rng = np.random.default_rng(0)
    nbits = 640
    seq = [(False, 0), (True, 300), (True, 300), (True, 320), (False, 0),
           (True, 300), (True, 440), (True, 443)]
    ref = LongTermPostFilter(CFG48)
    st = ltpf_init(p, 1)
    fn = jax.jit(lambda st, x, a, pi: ltpf_run(p, st, x, nbits, a, pi))
    for i, (act, idx) in enumerate(seq):
        x = rng.standard_normal(480).astype(np.float32) * 1000
        yo = ref.run(LtpfInfo(True, act, idx), nbits, x.copy())
        yj, st = fn(st, x[None], np.array([act]), np.array([idx], np.int32))
        err = np.abs(np.asarray(yj)[0] - yo)
        assert err.max() < 2e-3, f"frame {i} (case act={act} idx={idx}): {err.max()}"


@pytest.mark.parametrize("nbytes", [40, 80, 150])
def test_stream_parity_vs_oracle(nbytes):
    """Mixed content incl. LTPF-active pitch, PLC, silence: PCM within 1 LSB."""
    nframes = 10
    rng = np.random.default_rng(42)
    t = np.arange(nframes * 480) / 48000
    streams = [
        (8000 * np.sin(2 * np.pi * 220 * t)).astype(np.int16),
        (3000 * np.sin(2 * np.pi * 97 * t) + 300 * rng.standard_normal(len(t))).astype(np.int16),
        (1000 * rng.standard_normal(len(t))).astype(np.int16),
        np.zeros(len(t), np.int16),
    ]
    S = len(streams)
    encs = [Lc3Encoder(1, FrameDuration.MS10, 48000) for _ in range(S)]
    payloads = [
        [bytes(encs[s].encode_frame(0, streams[s][f * 480 : (f + 1) * 480], nbytes))
         for f in range(nframes)]
        for s in range(S)
    ]
    payloads[2][5] = bytes([255] * nbytes)  # corrupt -> PLC

    decs = [Lc3Decoder(1, FrameDuration.MS10, 48000) for _ in range(S)]
    state = decoder_init(CFG48, S)
    step = jax.jit(lambda st, fr: decode_step(CFG48, nbytes * 8, st, fr))
    worst = 0
    bad = 0
    for f in range(nframes):
        frames = parse_frames(CFG48, [payloads[s][f] for s in range(S)])
        state, pcm = step(state, frames)
        pcm = np.asarray(pcm)
        for s in range(S):
            ref = decs[s].decode_frame(16, 0, payloads[s][f])
            d = np.abs(pcm[s].astype(int) - ref.astype(int))
            worst = max(worst, int(d.max()))
            bad += int((d > 0).sum())
    assert worst <= 1
    assert bad <= S * nframes * 480 * 0.005  # <0.5% off-by-one


def test_8khz_7p5ms_parity():
    cfg = Lc3Config.new(8000, FrameDuration.MS7P5)
    nbytes = 30
    nframes = 8
    t = np.arange(nframes * 60) / 8000
    sig = (6000 * np.sin(2 * np.pi * 330 * t)).astype(np.int16)
    enc = Lc3Encoder(1, FrameDuration.MS7P5, 8000)
    dec = Lc3Decoder(1, FrameDuration.MS7P5, 8000)
    payloads = [bytes(enc.encode_frame(0, sig[f * 60 : (f + 1) * 60], nbytes))
                for f in range(nframes)]
    state = decoder_init(cfg, 1)
    step = jax.jit(lambda st, fr: decode_step(cfg, nbytes * 8, st, fr))
    for f in range(nframes):
        state, pcm = step(state, parse_frames(cfg, [payloads[f]]))
        ref = dec.decode_frame(16, 0, payloads[f])
        d = np.abs(np.asarray(pcm)[0].astype(int) - ref.astype(int))
        assert d.max() <= 1, f"frame {f}: {d.max()}"


def test_32khz_7p5ms_ltpf_parity():
    """7.5 ms geometry: 3-block LTPF memories, alternate fade length."""
    cfg = Lc3Config.new(32000, FrameDuration.MS7P5)
    nbytes = 60  # low enough rate for the LTPF gain to be active
    nframes = 10
    t = np.arange(nframes * cfg.nf) / cfg.fs
    sig = (8000 * np.sin(2 * np.pi * 180 * t)).astype(np.int16)
    enc = Lc3Encoder(1, FrameDuration.MS7P5, 32000)
    dec = Lc3Decoder(1, FrameDuration.MS7P5, 32000)
    payloads = [bytes(enc.encode_frame(0, sig[f * cfg.nf : (f + 1) * cfg.nf], nbytes))
                for f in range(nframes)]
    state = decoder_init(cfg, 1)
    step = jax.jit(lambda st, fr: decode_step(cfg, nbytes * 8, st, fr))
    ltpf_seen = False
    for f in range(nframes):
        frames = parse_frames(cfg, [payloads[f]])
        ltpf_seen |= bool(np.asarray(frames.ltpf_active).any())
        state, pcm = step(state, frames)
        ref = dec.decode_frame(16, 0, payloads[f])
        d = np.abs(np.asarray(pcm)[0].astype(int) - ref.astype(int))
        assert d.max() <= 1, f"frame {f}: {d.max()}"
    assert ltpf_seen, "test content failed to activate the LTPF"


def test_ltpf_chunked_path_bit_exact(monkeypatch):
    """Large-batch decode runs the LTPF in _LTPF_CHUNK-stream chunks
    (decoder.py: static unrolled slices, VMEM-resident per chunk). The
    chunked program must be bit-identical to the unchunked one; shrink the
    chunk width so a CPU-sized batch exercises the path, LTPF active, with
    carried state across frames."""
    import lc3jax.dsp.decoder as D

    cfg = Lc3Config.new(32000, FrameDuration.MS7P5)
    nbytes = 60
    nframes = 6
    S = 8
    t = np.arange(nframes * cfg.nf) / cfg.fs
    sig = (8000 * np.sin(2 * np.pi * 180 * t)).astype(np.int16)
    enc = Lc3Encoder(1, FrameDuration.MS7P5, 32000)
    payloads = [bytes(enc.encode_frame(0, sig[f * cfg.nf : (f + 1) * cfg.nf], nbytes))
                for f in range(nframes)]

    def run():
        state = decoder_init(cfg, S)
        step = jax.jit(lambda st, fr: D.decode_step(cfg, nbytes * 8, st, fr))
        out = []
        ltpf_seen = False
        for f in range(nframes):
            frames = parse_frames(cfg, [payloads[f]] * S)
            ltpf_seen |= bool(np.asarray(frames.ltpf_active).any())
            state, pcm = step(state, frames)
            out.append(np.asarray(pcm))
        assert ltpf_seen
        return np.stack(out)

    ref = run()  # unchunked: S=8 <= default chunk width
    monkeypatch.setattr(D, "_LTPF_CHUNK", 4)
    got = run()  # chunked: two 4-stream chunks
    np.testing.assert_array_equal(got, ref)

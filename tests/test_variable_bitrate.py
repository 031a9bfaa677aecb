"""Per-frame variable bitrate: switching (config, nbytes) programs
mid-stream while carrying codec state (VERDICT round-1 gap 5).

The reference derives nbits from the output buffer length every frame
(lc3_encoder.rs:65), so the bitrate may change at any frame boundary with
no renegotiation. The jitted programs are per-(cfg, nbytes); the state
pytrees are nbytes-independent, so BatchEncoder/BatchDecoder cache one
program per rate and carry state across switches — asserted here against
the oracle, which switches rates natively.
"""

import numpy as np
import pytest

from lc3jax.config import FrameDuration, Lc3Config
from lc3jax.serving import BatchDecoder, BatchEncoder

CFG = Lc3Config.new(48000, FrameDuration.MS10)
RATE_PLAN = [80, 80, 150, 150, 40, 40, 150, 80, 40, 150]


def _stream(seed=4):
    rng = np.random.default_rng(seed)
    t = np.arange(len(RATE_PLAN) * CFG.nf) / CFG.fs
    sig = 5000 * np.sin(2 * np.pi * 280 * t) + rng.normal(0, 800, t.shape)
    return np.clip(sig, -32768, 32767).astype(np.int16)


def test_variable_rate_decode_tracks_oracle():
    from lc3jax.ref.decoder import Lc3Decoder
    from lc3jax.ref.encoder import Lc3Encoder

    sig = _stream()
    enc = Lc3Encoder(1, CFG.n_ms, CFG.fs)
    dec_oracle = Lc3Decoder(1, CFG.n_ms, CFG.fs)
    dec = BatchDecoder(CFG, 1, RATE_PLAN[0])
    for f, nbytes in enumerate(RATE_PLAN):
        payload = bytes(enc.encode_frame(0, sig[f * CFG.nf : (f + 1) * CFG.nf], nbytes))
        want = dec_oracle.decode_frame(16, 0, payload)
        got = dec.decode(np.frombuffer(payload, np.uint8)[None])
        d = np.abs(got[0].astype(int) - want.astype(int))
        assert d.max() <= 1, f"frame {f} (nbytes={nbytes}): {d.max()} LSB"
    assert len(dec._steps) == 3  # one jitted program per distinct rate


def test_variable_rate_encode_decodable_and_mostly_exact():
    from lc3jax.ref.decoder import Lc3Decoder
    from lc3jax.ref.encoder import Lc3Encoder

    sig = _stream(seed=8)
    enc_oracle = Lc3Encoder(1, CFG.n_ms, CFG.fs)
    dec_oracle = Lc3Decoder(1, CFG.n_ms, CFG.fs)
    enc = BatchEncoder(CFG, 1, RATE_PLAN[0])
    n_exact = 0
    for f, nbytes in enumerate(RATE_PLAN):
        frame = sig[f * CFG.nf : (f + 1) * CFG.nf]
        want = bytes(enc_oracle.encode_frame(0, frame, nbytes))
        got = bytes(enc.encode(frame[None], nbytes=nbytes)[0])
        assert len(got) == nbytes
        n_exact += got == want
        dec_oracle.decode_frame(16, 0, got)  # every payload must decode
    # byte-exact across the whole rate plan since the round-3 exactness
    # work (batched kissfft DCT-IV + glibc-exact exp2f); statistical floor
    # on non-glibc hosts (see test_dsp_encoder.py)
    from lc3jax.dsp import libmexact

    floor = len(RATE_PLAN) if libmexact.available() else 0.8 * len(RATE_PLAN)
    assert n_exact >= floor, f"{n_exact}/{len(RATE_PLAN)}"

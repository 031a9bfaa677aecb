"""Pinned 50-frame regression stream (tests/goldens/stream50.npz).

Protects future optimization work: the oracle must stay byte/bit-identical;
the batched TPU path must stay within its documented +-1 LSB envelope.
"""

import numpy as np

from lc3jax.coding.host import parse_frames
from lc3jax.config import FrameDuration, Lc3Config

CFG48 = Lc3Config.new(48000, FrameDuration.MS10)


def test_oracle_encoder_regression(goldens):
    from lc3jax.ref.encoder import Lc3Encoder

    g = goldens("stream50")
    nbytes = int(g["nbytes"])
    enc = Lc3Encoder(1, FrameDuration.MS10, 48000)
    for f in range(g["pcm_in"].shape[0]):
        out = bytes(enc.encode_frame(0, g["pcm_in"][f].astype(np.int16), nbytes))
        assert out == bytes(g["payloads"][f]), f"frame {f} diverged"


def test_oracle_decoder_regression(goldens):
    from lc3jax.ref.decoder import Lc3Decoder

    g = goldens("stream50")
    dec = Lc3Decoder(1, FrameDuration.MS10, 48000)
    for f in range(g["payloads"].shape[0]):
        pcm = dec.decode_frame(16, 0, bytes(g["payloads"][f]))
        assert np.array_equal(pcm, g["pcm_out"][f].astype(np.int16)), f"frame {f}"


def test_tpu_decoder_regression(goldens):
    import jax

    from lc3jax.dsp.decoder import decode_step, decoder_init

    g = goldens("stream50")
    nbytes = int(g["nbytes"])
    state = decoder_init(CFG48, 1)
    step = jax.jit(lambda s, fr: decode_step(CFG48, nbytes * 8, s, fr))
    for f in range(g["payloads"].shape[0]):
        state, pcm = step(state, parse_frames(CFG48, [bytes(g["payloads"][f])]))
        d = np.abs(np.asarray(pcm)[0].astype(int) - g["pcm_out"][f].astype(int))
        assert d.max() <= 1, f"frame {f}: {d.max()}"


def test_tpu_encoder_regression(goldens):
    import jax
    from functools import partial

    from lc3jax.coding.host import pack_frames
    from lc3jax.dsp.encoder import encode_step, encoder_init

    g = goldens("stream50")
    nbytes = int(g["nbytes"])
    state = encoder_init(CFG48, 1)
    step = jax.jit(partial(encode_step, CFG48, nbytes))
    n_exact = 0
    from lc3jax.ref.decoder import Lc3Decoder

    # two oracle decoders: one fed the TPU payload stream, one the
    # reference payload stream — a divergent frame must not cost audio
    # quality (>= 40 dB frame SNR vs the reference decode), not merely
    # stay decodable
    dec_tpu = Lc3Decoder(1, FrameDuration.MS10, 48000)
    dec_ref = Lc3Decoder(1, FrameDuration.MS10, 48000)
    nframes = g["pcm_in"].shape[0]
    for f in range(nframes):
        state, fields = step(state, g["pcm_in"][f].astype(np.int16)[None])
        out = pack_frames(CFG48, {k: np.asarray(v) for k, v in fields.items()}, nbytes)[0]
        n_exact += out == bytes(g["payloads"][f])
        pcm_tpu = dec_tpu.decode_frame(16, 0, out).astype(np.float64)
        pcm_ref = dec_ref.decode_frame(16, 0, bytes(g["payloads"][f])).astype(np.float64)
        e_ref = np.sum(pcm_ref * pcm_ref)
        e_err = np.sum((pcm_ref - pcm_tpu) ** 2)
        if e_ref > 1e4 and e_err > 0:
            snr = 10.0 * np.log10(e_ref / e_err)
            assert snr >= 40.0, f"frame {f}: SNR {snr:.1f} dB"
    # 50/50 byte-exact since round 2; round 3's bit-exact MDCT + exp2f
    # (dsp/fftexact.py, dsp/libmexact.py) make exactness by-construction
    # on CPU, so assert it outright
    assert n_exact == nframes
